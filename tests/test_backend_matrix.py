"""Backend parametrization matrix (SURVEY §5 / reference
tests/common.py:228-257): the SAME operator battery must give identical
results whether the frame is plain, re-read from parquet, a 4-way
concatenation, or a filtered superset — operator semantics must not
depend on storage or plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def variants(spark, base_df, tmp_path_factory):
    import vaex_spark as vs
    from vaex_spark.dataframe import DataFrame
    out = {"plain": base_df}
    # parquet-backed
    p = str(tmp_path_factory.mktemp("matrix") / "base.parquet")
    base_df.export_parquet(p, single_file=True)
    pq = vs.open(p, spark=spark)
    pq.set_variable("t", 1.0)
    pq["z"] = "x + t*y"
    out["parquet"] = pq
    # 4-way concat of row slices
    parts = pq.split([0.25, 0.25, 0.25, 0.25])
    cat = parts[0].concat(parts[1], parts[2], parts[3])
    cat.set_variable("t", 1.0)
    cat["z"] = "x + t*y"
    out["concat"] = cat
    # filtered superset: junk rows (x shifted up) hidden by a filter
    junk = DataFrame(pq._spark_df().withColumn("x", F.col("x") + 1000.0))
    sup = pq.concat(junk)
    flt = sup[sup["x"] < 500.0]
    flt.set_variable("t", 1.0)
    flt["z"] = "x + t*y"
    out["filtered"] = flt
    return out


def _battery(df):
    import pandas as pd
    res = {}
    res["count"] = df.count()
    res["sum_x"] = round(float(df.sum("x")), 9)
    res["mean_y"] = round(float(df.mean("y")), 9)
    res["count_m"] = df.count("m")          # skips null
    res["count_nm"] = df.count("nm")        # skips null AND nan
    res["minmax"] = tuple(np.round(df.minmax("x"), 9))
    res["nunique_bool"] = df.nunique("bool")
    g = (df.groupby("bool", agg={"n": F.count(F.lit(1)),
                                 "sx": F.sum(F.col("x"))}, sort=True)
         .to_pandas_df())
    res["groupby"] = [(bool(r["bool"]), int(r.n), round(float(r.sx), 9)) for _, r in g.iterrows()]
    res["z_sum"] = round(float(df.sum("z")), 9)
    s = df.sort("x")
    res["sorted_head"] = [round(v, 9) for v in s.evaluate("x")[:5].tolist()]
    res["uniq_names"] = sorted(df.unique("name").tolist())[:3]
    res["str_upper"] = sorted(
        df["name"].str.upper().evaluate().tolist())[:2]
    res["filter_combo"] = df[(df["x"] >= 0) & (df["x"] < 10)].count()
    return res


@pytest.mark.parametrize("variant", ["parquet", "concat", "filtered"])
def test_operator_battery_invariant(variants, variant):
    want = _battery(variants["plain"])
    got = _battery(variants[variant])
    assert got == want, f"{variant}: {got} != {want}"
