"""Mergeable cardinality sketches — persistable corpus statistics.

The incremental-pipeline complement to ``dataframe.nunique(approx=)``:
a one-shot approx-distinct answers "how many unique urls NOW", but a
100 TB snapshot pipeline needs "how many unique urls EVER, updated per
batch, without rescanning history".  Spark's Datasketches HLL
aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``, JVM-side, whole-stage codegen) make the state
a few-KB binary per group that unions losslessly across snapshots:

    s1 = distinct_sketch(batch1, "url", group_col="source")
    s1.export_parquet(".../sketches/day=1")        # persist the STATE
    ...
    merged = merge_sketch_tables(s_old, s_new, group_col="source")
    estimate_distinct(merged, group_col="source")  # running cardinality

Estimates are within ~1.6%/sqrt(2^lgk) (relative standard error ~0.8%
at the default lgk=12, ~2 KB a sketch); merging never loses precision
beyond the sketch's own bound.  Each call is a plain groupBy over
binary state — group count rows move, never documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["distinct_sketch", "merge_sketch_tables", "estimate_distinct"]

_SKETCH = "__hll"


def _sdf(df):
    return df._spark_df() if hasattr(df, "_spark_df") else df


def _wrap(sdf):
    from ..dataframe import DataFrame
    return DataFrame(sdf)


def distinct_sketch(df, key_col: str, group_col=None, lgk: int = 12):
    """Build (group?, __hll binary) — the persistable sketch table."""
    sdf = _sdf(df)
    agg = F.hll_sketch_agg(F.col(key_col), F.lit(int(lgk))).alias(_SKETCH)
    if group_col is None:
        return _wrap(sdf.agg(agg))
    groups = group_col if isinstance(group_col, (list, tuple)) else [group_col]
    return _wrap(sdf.groupBy(*groups).agg(agg))


def merge_sketch_tables(*tables, group_col=None,
                        allow_different_lgk: bool = False):
    """Union N sketch tables into one: per group, the HLL union of all
    member sketches (lossless up to sketch precision).  This is the
    cross-snapshot merge — inputs are state tables, so the whole
    operation moves a few KB per group."""
    assert tables, "need at least one sketch table"
    sdfs = [_sdf(t) for t in tables]
    uni = sdfs[0]
    for s in sdfs[1:]:
        uni = uni.unionByName(s)
    agg = F.hll_union_agg(F.col(_SKETCH),
                          F.lit(bool(allow_different_lgk))).alias(_SKETCH)
    if group_col is None:
        return _wrap(uni.agg(agg))
    groups = group_col if isinstance(group_col, (list, tuple)) else [group_col]
    return _wrap(uni.groupBy(*groups).agg(agg))


def estimate_distinct(sketch_df, group_col=None, alias: str = "n_distinct"):
    """Read the running estimate out of a sketch table."""
    sdf = _sdf(sketch_df)
    est = F.hll_sketch_estimate(F.col(_SKETCH)).cast("long").alias(alias)
    if group_col is None:
        return _wrap(sdf.select(est))
    groups = group_col if isinstance(group_col, (list, tuple)) else [group_col]
    return _wrap(sdf.select(*[F.col(g) for g in groups], est))
