"""Sources: vaex.open and the from_* constructor family (reference:
vaex-core/vaex/__init__.py:111-648).

``open`` sniffs the format from the extension/glob like the reference
(:111-272) and maps every format onto the corresponding Spark reader —
splittable, predicate-pushing scans rather than mmap.  HDF5 (the
reference's native store) has no distributed Spark source; per SURVEY
§2.1 Parquet is our native store and HDF5 goes through a driver-side
pyarrow/h5py bridge when the lib is present (gated import).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession

from ..dataframe import DataFrame
from ..session import get_session


def _spark(spark: SparkSession | None) -> SparkSession:
    return spark or get_session()


_OPENABLE_EXTS = (".parquet", ".pq", ".csv", ".txt", ".asc", ".json",
                  ".arrow", ".feather", ".hdf5", ".h5")


def can_open(path) -> bool:
    """reference dataframe.py:3004 — extension-level openability test."""
    p = str(path)
    ext = os.path.splitext(p.split("?")[0])[1].lower()
    return ext in _OPENABLE_EXTS or os.path.isdir(p)


def open(path, spark: SparkSession | None = None, convert=False, shuffle=False,
         fs_options=None, fs=None, **kwargs) -> DataFrame:
    """vaex.open analogue (reference __init__.py:111).

    Accepts a single path, a glob pattern, or a list of paths; format
    from extension.  ``s3://``/``gs://`` URIs pass straight to the
    Hadoop filesystem layer (the reference's fs_options/cache machinery
    is native in Spark).
    """
    spark = _spark(spark)
    if isinstance(path, (list, tuple)):
        return open_many(path, spark=spark)
    p = str(path)
    ext = os.path.splitext(p.split("?")[0])[1].lower()
    if convert and ext not in (".parquet", ".pq"):
        # reference __init__.py:111 convert= semantics: materialize a
        # columnar copy once, open that thereafter
        target = p if isinstance(convert, bool) else str(convert)
        if isinstance(convert, bool):
            target = p + ".parquet"
        if not os.path.exists(target):
            open(p, spark=spark).export_parquet(target)
        return open(target, spark=spark, shuffle=shuffle)
    reader = spark.read
    if ext in (".parquet", ".pq"):
        df = DataFrame(_read_parquet(spark, p))
    elif ext == ".orc":
        df = DataFrame(reader.orc(p))
    elif ext in (".csv", ".txt", ".asc"):
        df = DataFrame(reader.option("header", True).option("inferSchema", True).csv(p))
    elif ext == ".json":
        df = DataFrame(reader.json(p))
    elif ext in (".arrow", ".feather"):
        import pyarrow.feather as feather
        table = feather.read_table(p)
        df = from_arrow_table(table, spark=spark)
    elif ext in (".hdf5", ".h5"):
        df = _open_hdf5(p, spark)
    elif os.path.isdir(p):
        df = DataFrame(reader.parquet(p))
    else:
        raise ValueError(f"unknown format {ext!r} for {path}")
    if shuffle:
        return df.shuffle()
    return df


def _read_parquet(spark: SparkSession, path: str):
    """Parquet scan with TIMESTAMP(NANOS) tolerance.

    Spark's vectorized reader rejects parquet nanosecond timestamps
    ([PARQUET_TYPE_ILLEGAL]); with ``spark.sql.legacy.parquet.nanosAsLong``
    they scan as raw int64 nanos.  We sniff the footer (pyarrow, metadata
    only — no data read) and rebuild such columns as micro-truncated
    timestamps, so downstream semantics match DuckDB/pyarrow (which
    truncate ns->us the same way).  Pushdown on other columns is
    unaffected; the rebuilt column is a cheap projection."""
    from pyspark.sql import functions as F
    ns_cols: list[str] = []
    schema = None
    sample = path
    try:
        import pyarrow.parquet as pq
        import glob as g
        sample = path
        if "*" in path:
            matches = g.glob(path)
            sample = matches[0] if matches else path
        elif os.path.isdir(path):
            inner = [f for f in g.glob(os.path.join(path, "**", "*.parquet"), recursive=True)]
            sample = inner[0] if inner else path
        schema = pq.read_schema(sample)
        ns_cols = [f.name for f in schema if str(f.type).startswith("timestamp[ns")]
    except Exception:
        ns_cols = []
    if not ns_cols:
        if sample == path and not os.path.isdir(path) and schema is not None:
            # single plain file: we already hold the footer schema from
            # the ns sniff — pass it explicitly and skip Spark's schema
            # inference job (~0.1 s per open; a query touching 4 tables
            # pays it 4x).  Directories and globs keep inference so
            # hive-partition columns (absent from any one footer) are
            # still discovered.
            try:
                from pyspark.sql.pandas.types import from_arrow_schema
                return spark.read.schema(from_arrow_schema(schema)).parquet(path)
            except Exception:  # unmapped arrow type -> infer as before
                pass
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sdf = spark.read.parquet(path)
    for c in ns_cols:
        # integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed double's
        # 2^53 exact-integer range, so float division drifts by ~100s of ns
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return sdf


def open_many(paths, spark: SparkSession | None = None) -> DataFrame:
    """reference __init__.py:273 — vertical concat of many files."""
    spark = _spark(spark)
    paths = list(paths)
    exts = {os.path.splitext(str(p))[1].lower() for p in paths}
    if exts <= {".parquet", ".pq"}:
        return DataFrame(spark.read.parquet(*[str(p) for p in paths]))
    dfs = [open(p, spark=spark) for p in paths]
    return dfs[0].concat(*dfs[1:])


def _open_hdf5(path: str, spark: SparkSession) -> DataFrame:
    try:
        import h5py  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "HDF5 requires h5py (not bundled); export to parquet instead — "
            "Parquet is the native store of this engine (SURVEY §2.1)") from e
    import h5py
    import numpy as np
    with h5py.File(path, "r") as f:
        group = f.get("table/columns") or f.get("data")
        data = {}
        for name in group:
            node = group[name]
            arr = node["data"][:] if isinstance(node, h5py.Group) else node[:]
            data[name] = np.asarray(arr)
    return from_dict(data, spark=spark)


def from_pandas(pdf, spark: SparkSession | None = None) -> DataFrame:
    return DataFrame(_spark(spark).createDataFrame(pdf))


def from_arrow_table(table, spark: SparkSession | None = None) -> DataFrame:
    spark = _spark(spark)
    try:
        return DataFrame(spark.createDataFrame(table))  # Spark 4 accepts pa.Table
    except Exception:
        return DataFrame(spark.createDataFrame(table.to_pandas()))


def from_arrays(spark: SparkSession | None = None, **arrays) -> DataFrame:
    import pyarrow as pa
    table = pa.table({k: pa.array(v) for k, v in arrays.items()})
    return from_arrow_table(table, spark=spark)


def from_dict(data: dict, spark: SparkSession | None = None) -> DataFrame:
    return from_arrays(spark=spark, **data)


def from_items(*items, spark: SparkSession | None = None) -> DataFrame:
    return from_arrays(spark=spark, **dict(items))


def from_scalars(spark: SparkSession | None = None, **kwargs) -> DataFrame:
    return from_arrays(spark=spark, **{k: [v] for k, v in kwargs.items()})


def from_records(records: list[dict], spark: SparkSession | None = None) -> DataFrame:
    return DataFrame(_spark(spark).createDataFrame(records))


def from_csv(path, spark: SparkSession | None = None, chunk_size=None, convert=False, **kwargs) -> DataFrame:
    """Both the eager (reference __init__.py:571) and lazy arrow
    (csv.py:134) CSV paths map to Spark's splittable csv scan."""
    spark = _spark(spark)
    reader = spark.read.option("header", True).option("inferSchema", True)
    for k, v in kwargs.items():
        reader = reader.option(k, v)
    df = DataFrame(reader.csv(str(path)))
    if convert:
        target = str(path) + ".parquet"
        df.export_parquet(target)
        return open(target, spark=spark)
    return df


def from_csv_arrow(path, spark: SparkSession | None = None, lazy=True, **kwargs) -> DataFrame:
    return from_csv(path, spark=spark, **kwargs)


def from_json(path, spark: SparkSession | None = None, orient=None, lines=True, **kwargs) -> DataFrame:
    spark = _spark(spark)
    if lines:
        return DataFrame(spark.read.json(str(path)))
    import pandas as pd
    return from_pandas(pd.read_json(path, orient=orient), spark=spark)


def from_ascii(path, spark: SparkSession | None = None, seperator=None, **kwargs) -> DataFrame:
    spark = _spark(spark)
    reader = (spark.read.option("header", True).option("inferSchema", True)
              .option("delimiter", seperator or " "))
    return DataFrame(reader.csv(str(path)))


def vrange(start, stop, step=1, spark: SparkSession | None = None) -> DataFrame:
    """reference __init__.py:827 — virtual range column, zero storage.
    spark.range is exactly this (generated relation, no materialization)."""
    spark = _spark(spark)
    sdf = spark.range(int(start), int(stop), int(step)).withColumnRenamed("id", "x")
    return DataFrame(sdf)


def vconstant(value, length, spark: SparkSession | None = None) -> DataFrame:
    from pyspark.sql import functions as F
    spark = _spark(spark)
    return DataFrame(spark.range(length).select(F.lit(value).alias("x")))


def connect(url: str, **kwargs) -> SparkSession:
    """Remote dataframe (reference: vaex-server, ``vaex.connect`` —
    packages/vaex-server, ~600 LoC of websocket/REST executor bridging).

    The Spark-native answer is **Spark Connect**: a thin gRPC session
    against a remote cluster; every vaex_spark operator then builds its
    plan client-side and executes remotely unchanged — the engine
    equivalent of the reference's server-side task forwarding, with
    Catalyst instead of a custom protocol.

    ``url`` is a Spark Connect endpoint (``sc://host:port``).  Returns a
    SparkSession to pass into ``vs.open(..., spark=session)``.
    ``grpcio`` (the Connect client transport) is not bundled in this
    environment, so the gate below raises with the actionable cause
    instead of PySpark's PACKAGE_NOT_INSTALLED at first use (probed
    round 6: ``SparkSession.builder.remote("local[2]")`` — even the
    in-process Connect server path — needs it).
    """
    try:
        import grpc  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "vaex_spark.connect requires the optional 'grpcio' package "
            "(Spark Connect's client transport)") from e
    from pyspark.sql import SparkSession as _S
    return _S.builder.remote(url).getOrCreate()


def example(spark: SparkSession | None = None) -> DataFrame:
    """vaex.example() — a small bundled dataset; we use the sf0.001
    lineitem table when present."""
    p = "/root/testdata/sf0.001/lineitem.parquet"
    if os.path.exists(p):
        return open(p, spark=spark)
    return vrange(0, 1000, spark=spark)


def from_astropy_table(table, spark: SparkSession | None = None) -> DataFrame:
    """reference __init__.py:from_astropy_table — gated on astropy."""
    try:
        import astropy.table  # noqa: F401
    except ImportError as e:
        raise ImportError("from_astropy_table requires the optional 'astropy' package") from e
    return from_pandas(table.to_pandas(), spark=spark)


def from_samp(username=None, password=None):
    raise ImportError("from_samp requires the optional 'astropy' (samp) stack")
