"""Training-mix budget sampling: cap each domain/source/language at a
token (or char) budget — the "data mixing" stage of an LM pipeline,
where a 100 TB crawl is down-sampled per source to a target recipe.

Two strategies, both deterministic:

* ``strategy='exact'`` — documents are taken in ``order_key`` order per
  group until the group's budget is exhausted (the document that
  crosses the budget line is excluded).  A per-group running sum —
  SQL-expressible, so oracle-checkable.  Scale note: each group's
  cumsum is one window partition, i.e. one task per group; right for
  up-to-thousands of groups with bounded per-group volume.  For a
  handful of groups over billions of rows use ``'hash'``.
* ``strategy='hash'`` — per-group totals are aggregated once (cheap,
  map-side combined), then each document keeps iff
  ``xxhash64(id, seed) pmod M < M * budget/total`` — a single scan, no
  per-group ordering, budget hit in expectation with O(sqrt) deviation.
  Deterministic given (ids, seed): re-runs and retries select the same
  documents, which is what makes the mix reproducible at 100 TB.

Groups absent from ``budgets`` are dropped (an explicit recipe is the
point of a mix); pass ``float('inf')`` to pass a group through.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["mix_budget"]


def mix_budget(df, budgets: dict, group_col: str = "source",
               length_col: str = "n_chars", order_key: str = "doc_id",
               id_col: str = "doc_id", strategy: str = "exact",
               seed: int = 42):
    """Return the rows selected by the mix recipe (all input columns)."""
    from ..dataframe import DataFrame
    wrapped = isinstance(df, DataFrame)
    sdf = df._spark_df() if wrapped else df
    if not budgets:
        raise ValueError("budgets must map group values to budgets")
    length = F.col(length_col).cast("double")

    finite = {k: float(v) for k, v in budgets.items()}
    budget_expr = None
    for k, v in finite.items():
        cond = F.col(group_col).eqNullSafe(F.lit(k))
        budget_expr = (F.when(cond, F.lit(v)) if budget_expr is None
                       else budget_expr.when(cond, F.lit(v)))
    budget_expr = budget_expr.otherwise(F.lit(None))

    if strategy == "exact":
        from pyspark.sql import Window
        w = (Window.partitionBy(group_col).orderBy(order_key)
             .rowsBetween(Window.unboundedPreceding, -1))
        before = F.coalesce(F.sum(length).over(w), F.lit(0.0))
        out = (sdf.withColumn("__budget", budget_expr)
               .filter(F.col("__budget").isNotNull())
               .withColumn("__before", before)
               .filter(F.col("__before") + length <= F.col("__budget"))
               .drop("__budget", "__before"))
    elif strategy == "hash":
        totals = (sdf.groupBy(group_col)
                  .agg(F.sum(length).alias("__total")))
        frac = F.least(F.lit(1.0), F.col("__budget") / F.col("__total"))
        m = F.lit(1 << 30)
        key = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), m).cast("double") / m
        out = (sdf.join(F.broadcast(totals), on=group_col)
               .withColumn("__budget", budget_expr)
               .filter(F.col("__budget").isNotNull())
               .filter(key < frac)
               .drop("__total", "__budget"))
    else:
        raise ValueError(f"strategy={strategy!r} (exact|hash)")
    return DataFrame(out) if wrapped else out
