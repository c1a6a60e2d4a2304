"""vaex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vaexio/vaex.

Design (SURVEY.md §7): a thin lazy DataFrame façade over pyspark.sql.
Expressions compile to Catalyst Column trees; statistics compile to
(conditional) aggregates; binby compiles to groupBy-on-computed-bins;
everything heavy runs JVM-side in whole-stage codegen.  Beyond-parity
modules: Structured Streaming surface (:mod:`vaex_spark.streaming`) and
large-scale training-data ops (:mod:`vaex_spark.datapipe` — dedup,
similarity search, text analysis, multimodal plumbing).
"""

from . import agg  # noqa: F401
from . import ml  # noqa: F401
from .dataframe import DataFrame, set_ansi_policy  # noqa: F401
from .expression import Expression  # noqa: F401
from . import cache  # noqa: F401
from . import memory  # noqa: F401
from .memory import GridMemoryError  # noqa: F401
from .functions import register_function, registry  # noqa: F401
from .groupby import Binner, BinnerTime, GrouperLimited, RowLimitException  # noqa: F401
from .session import get_session  # noqa: F401
from . import stat  # noqa: F401
from .delayed import delayed, delayed_args, delayed_list  # noqa: F401
from .sources import (  # noqa: F401
    connect,
    from_astropy_table,
    from_samp,
    example,
    from_arrays,
    from_arrow_table,
    from_ascii,
    from_csv,
    from_csv_arrow,
    from_dict,
    from_items,
    from_json,
    from_pandas,
    from_records,
    from_scalars,
    open,
    open_many,
    vconstant,
    vrange,
)

__version__ = "0.1.0"


def concat(dfs, resolver="flexible"):
    """vaex.concat (reference __init__.py:819)."""
    first, *rest = dfs
    return first.concat(*rest, resolver=resolver)


def read_csv(path, **kwargs):
    """Alias of from_csv (reference __init__.py:480)."""
    return from_csv(path, **kwargs)


def dtype_of(expression):
    """Spark SQL type name of an expression (reference dtype_of returns
    a vaex DataType; the engine-native analogue is the Catalyst type)."""
    return expression.dtype


def dtype(type_spec):
    """Normalize a type spec to a Spark SQL type name."""
    import numpy as np
    if isinstance(type_spec, str):
        return type_spec
    mapping = {np.float64: "double", np.float32: "float", np.int64: "bigint",
               np.int32: "int", np.int16: "smallint", np.int8: "tinyint",
               np.bool_: "boolean", np.object_: "string", np.str_: "string"}
    key = np.dtype(type_spec).type if not isinstance(type_spec, type) or issubclass(type_spec, np.generic) else type_spec
    try:
        return mapping[np.dtype(type_spec).type]
    except Exception:
        return mapping.get(key, str(type_spec))


def string_column(strings):
    """reference __init__.py:744 — build an arrow string array."""
    import pyarrow as pa
    return pa.array(strings, type=pa.string())


def register_dataframe_accessor(name, cls=None, override=False):
    """reference __init__.py:858 — attach a lazily-constructed accessor
    (df.<name>) to every DataFrame.  Usable as a decorator."""
    from .dataframe import DataFrame

    def wrapper(accessor_cls):
        if hasattr(DataFrame, name) and not override:
            raise ValueError(f"DataFrame already has attribute {name!r}")
        prop = property(lambda df: accessor_cls(df))
        setattr(DataFrame, name, prop)
        return accessor_cls

    return wrapper(cls) if cls is not None else wrapper


def from_arrow_dataset(ds, spark=None):
    """reference __init__.py:401 — pyarrow.dataset input.  Distributed
    path: file-backed datasets re-open through the native Spark reader
    (so the scan stays parallel and prunable); in-memory datasets go
    through an arrow table."""
    files = list(getattr(ds, "files", None) or [])
    if files:
        return open(files if len(files) > 1 else files[0], spark=spark)
    return from_arrow_table(ds.to_table(), spark=spark)


def from_dataset(dataset, spark=None):
    """reference __init__.py:393 — wrap an existing dataset object:
    a Spark DataFrame, a pyarrow Table/Dataset, or a pandas frame."""
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import DataFrame as SparkDataFrame
    from .dataframe import DataFrame
    if isinstance(dataset, DataFrame):
        return dataset
    if isinstance(dataset, SparkDataFrame):
        return DataFrame(dataset)
    if isinstance(dataset, pa.Table):
        return from_arrow_table(dataset, spark=spark)
    if isinstance(dataset, pd.DataFrame):
        return from_pandas(dataset, spark=spark)
    return from_arrow_dataset(dataset, spark=spark)


def _set_log_level(level):
    import logging
    logging.getLogger("vaex_spark").setLevel(level)
    try:
        get_session().sparkContext.setLogLevel(
            {10: "DEBUG", 20: "INFO", 30: "WARN", 40: "ERROR", 99: "OFF"}[level])
    except Exception:
        pass


def set_log_level_debug():
    _set_log_level(10)


def set_log_level_info():
    _set_log_level(20)


def set_log_level_warning():
    _set_log_level(30)


def set_log_level_exception():
    _set_log_level(40)


def set_log_level_off():
    _set_log_level(99)


def app(*args, **kwargs):
    """reference __init__.py:86 — Qt UI launcher.  The desktop UI is a
    vaex-ui optional dependency and out of scope for the Spark engine
    (SURVEY §3.4); gated honestly like the other viz surfaces."""
    raise ImportError("vaex_spark.app requires the optional Qt 'vaex-ui' "
                      "stack, which this engine does not bundle")
