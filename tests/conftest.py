import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Derandomized hypothesis profile: property tests replay the same example
# corpus every run (plus the persisted failure database), so a property
# failure found once (e.g. the join_range closed='neither' regression at
# seed 206) reproduces on every subsequent run instead of flickering.
try:
    from hypothesis import settings as _hyp_settings
    _hyp_settings.register_profile("ci", derandomize=True, deadline=None)
    _hyp_settings.load_profile("ci")
except ImportError:  # pragma: no cover
    pass

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import vaex_spark as vs
    return vs.get_session(app_name="vaex_spark_tests")


@pytest.fixture(scope="session")
def base_df(spark):
    """Port of the reference's create_base_ds corner-case matrix
    (tests/common.py:314-381 / FIXTURES.md F1): floats, NaN vs null,
    nullable ints, int64 extremes, strings, bools, datetimes."""
    import pandas as pd
    import pyarrow as pa
    import vaex_spark as vs
    nan = float("nan")
    x = np.arange(-2.0, 19.0)  # 21 rows: -2..18
    # null-vs-NaN distinction requires arrow arrays (pandas float columns
    # coerce None -> NaN, which is exactly the trap FIXTURES F1 tests)
    table = pa.table({
        "x": pa.array(x),
        "y": pa.array(x ** 2),
        "m": pa.array([None if i in (1, 2) else float(v) for i, v in enumerate(x)], type=pa.float64()),
        "n": pa.array([nan if i in (3, 4) else float(v) for i, v in enumerate(x)], type=pa.float64()),
        "nm": pa.array([nan if i in (3, 4) else (None if i in (5, 6) else float(v)) for i, v in enumerate(x)], type=pa.float64()),
        "mi": pa.array([None if i in (1, 2) else int(v) for i, v in enumerate(x)], type=pa.int64()),
        "ints": pa.array([int(2 ** 62) + 1 if i == 0 else (-int(2 ** 62) + 1 if i == 1 else int(v)) for i, v in enumerate(x)]),
        "name": pa.array([f"{v}bla" + "_" * max(0, int(v)) for v in x]),
        "bool": pa.array([i not in (4, 6, 8, 14, 16, 19) for i in range(21)]),
        "datetime": pa.array(pd.date_range("1991-01-01", periods=21, freq="499D")),
    })
    df = vs.from_arrow_table(table, spark=spark)
    df.set_variable("t", 1.0)  # must exist before the expression compiles
    df["z"] = "x + t*y"
    return df


@pytest.fixture(scope="session")
def lineitem(spark):
    import vaex_spark as vs
    return vs.open(f"{SF_DIR}/lineitem.parquet", spark=spark)


@pytest.fixture(scope="session")
def events(spark):
    import vaex_spark as vs
    return vs.open(f"{SF_DIR}/events.parquet", spark=spark)


@pytest.fixture(scope="session")
def docs(spark):
    import vaex_spark as vs
    return vs.open(f"{SF_DIR}/documents.parquet", spark=spark)
