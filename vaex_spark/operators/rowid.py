"""Row-id discipline (SURVEY §2.6 / §7 'Row order').

vaex's order-based operators (shift/diff/rolling, positional join, take,
sequential split) assume the physical row order of the dataset.  Spark
row order is undefined, so we materialize an explicit ``__row_id``.

Two strategies:

* ``with_row_id`` — contiguous 0..n-1 ids matching the scan order.
  Implemented as a two-job zipWithIndex equivalent on the DataFrame
  level: per-partition counts (tiny job) -> per-partition offset added
  to a partition-local index.  This is exactly how RDD.zipWithIndex
  works, but kept in DataFrame land so Catalyst can still prune columns
  underneath.  Cost: one extra pass over partition *counts* (metadata-
  sized), not the data.
* ``with_monotonic_id`` — one-pass, non-contiguous but order-preserving
  ids (monotonically_increasing_id).  Enough for ordering windows, not
  for positional equality; used when only relative order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

ROW_ID = "__row_id"


def bounded_window(*order_cols) -> Window:
    """A global-order window for PROVABLY BOUNDED frames only (partition
    counts, top-k survivors, driver-bound distinct sets).

    ``Window.orderBy(...)`` with no partition spec funnels all rows into
    one task and logs a WindowExec degradation warning on every run.
    For metadata-sized inputs that single task is the *intended* plan;
    partitioning by a non-foldable constant (``rand(seed)*0`` — always
    0, but opaque to constant folding so Catalyst keeps the spec) gets
    the same physical shape deliberately and quietly.  Never use this on
    data-sized frames — `operators/window._apply_windowed` has the real
    partition-boundary-exchange rewrite for those.
    """
    return Window.partitionBy((F.rand(0) * 0).cast("int")).orderBy(*order_cols)


#: logical nodes whose re-materialization reproduces identical row
#: placement and order (columnar scans, pure row-local transforms, an
#: already-pinned cache).  Everything else — Sort/Join/Aggregate but
#: also Sample, GlobalLimit/LocalLimit/Offset, Generate, Repartition,
#: Union (branch interleave) — must persist before branching.
_DETERMINISTIC_NODES = frozenset({
    "Project", "Filter", "Relation", "LocalRelation", "InMemoryRelation",
    "SubqueryAlias", "ResolvedHint", "UnresolvedHint",
})

#: expression markers that make even a Project/Filter nondeterministic
_NONDET_EXPRS = ("rand(", "randn(", "uuid()", "shuffle(",
                 "monotonically_increasing_id()")


def _plan_is_deterministic(plan: str) -> bool:
    if any(t in plan for t in _NONDET_EXPRS):
        return False
    for line in plan.splitlines():
        node = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0].rstrip(",")
        if node and node not in _DETERMINISTIC_NODES:
            return False
    return True


def with_monotonic_id(sdf: SparkDataFrame, name: str = ROW_ID) -> SparkDataFrame:
    return sdf.withColumn(name, F.monotonically_increasing_id())


def with_row_id(sdf: SparkDataFrame, name: str = ROW_ID) -> SparkDataFrame:
    """Contiguous row ids in scan order, distributed.

    monotonically_increasing_id encodes (partition_id << 33) + local_idx;
    we subtract per-partition bases and add cumulative row offsets.  The
    offsets table is partition-count-sized -> broadcast join is free.
    At 100 TB this stays two metadata-light jobs; no global sort, no
    single-task bottleneck (contrast with Window.orderBy over everything).
    """
    tagged = sdf.withColumn("__mono", F.monotonically_increasing_id())
    tagged = tagged.withColumn("__pid", F.spark_partition_id())
    # the counts branch and the main join below each re-read `tagged`.
    # On a plain scan/filter/project that is safe (row placement and
    # order are deterministic), but downstream of a sort, join, agg,
    # repartition, sample, limit/offset, or generate the two
    # materializations can disagree — range boundaries are sampled per
    # RDD, shuffle fetch order races, limits take whichever rows arrive
    # first — and per-partition counts then describe a layout the main
    # branch does not have, leaving row ids non-contiguous.  The
    # heuristic is INVERTED from a denylist (round-3 ADVICE: Sample/
    # Offset/CollectLimit/Generate slipped through): only a plan made
    # purely of known-deterministic nodes with no nondeterministic
    # expressions skips the pin.
    if not _plan_is_deterministic(
            sdf._jdf.queryExecution().optimizedPlan().toString()):
        from ..cache import _register_persist
        tagged = _register_persist(tagged)
    counts = (tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"),
                                          F.min("__mono").alias("__base")))
    w = bounded_window("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__offset", F.coalesce(F.sum("__cnt").over(w), F.lit(0)))
    out = (tagged.join(F.broadcast(offsets.select("__pid", "__base", "__offset")), on="__pid")
           .withColumn(name, F.col("__mono") - F.col("__base") + F.col("__offset"))
           .drop("__mono", "__pid", "__base", "__offset"))
    return out
