"""Join operator (reference: vaex-core/vaex/join.py:125-297, entry
dataframe.py:6688).

Reference semantics replicated (SURVEY §2.4):

* ``how`` in {'left','right','inner'}; vaex implements 'right' by
  swapping sides — so do we (keeps the broadcast side consistent).
* Single-key equi join via ``on`` or ``left_on``/``right_on``.
* No key -> positional row join (join.py:164): both sides get row ids
  and join on them.
* Duplicate keys on the right raise unless ``allow_duplication=True``
  (join.py:173-215); Spark would silently explode rows, so the guard is
  an aggregation precheck (one cheap job over the key column only —
  Catalyst prunes the rest).
* Name collisions resolved with l/r prefix/suffix (join.py:225-255).

Scale strategy: vaex assumes the right side fits an in-memory hash index
(join.py docstring); the honest Spark analogue is a **broadcast hash
join**, which we hint when the right side is estimable-small.  Larger
sides fall back to Catalyst's sort-merge with AQE skew splitting —
strictly more scalable than the reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .rowid import ROW_ID, with_row_id

BROADCAST_LIMIT_BYTES = 64 * 1024 * 1024  # force-broadcast only clearly-small sides


def _size_hint_bytes(sdf) -> int | None:
    try:
        plan = sdf._jdf.queryExecution().optimizedPlan()
        return int(plan.stats().sizeInBytes().toString())
    except Exception:
        return None


def join(left, right, on=None, how="left", left_on=None, right_on=None,
         lprefix="", rprefix="", lsuffix="", rsuffix="", allow_duplication=False):
    """allow_duplication: False (vaex default) runs the duplicate-key
    precheck and raises on duplicates; True permits duplication without
    checking; None skips the check entirely (trust the caller — at 100 TB
    the guard is a full pre-scan of the right side's key column)."""
    from ..dataframe import DataFrame

    if how == "right":
        return join(right, left, on=on, how="left",
                    left_on=right_on, right_on=left_on,
                    lprefix=rprefix, rprefix=lprefix,
                    lsuffix=rsuffix, rsuffix=lsuffix,
                    allow_duplication=allow_duplication)
    if how not in ("left", "inner"):
        raise ValueError(f"how={how!r} not supported (vaex parity: left/right/inner)")

    lsdf = left._spark_df()
    rsdf = right._spark_df() if isinstance(right, DataFrame) else right

    left_on = left_on or on
    right_on = right_on or on

    positional = left_on is None
    if positional:
        # join.py:164 row-number join
        lsdf = with_row_id(lsdf, ROW_ID)
        rsdf = with_row_id(rsdf, ROW_ID)
        left_on = right_on = ROW_ID

    if allow_duplication is False and not positional:
        dup = (rsdf.groupBy(F.col(right_on)).count().filter(F.col("count") > 1).limit(1).count())
        if dup:
            raise ValueError(
                f"joining with duplicate right keys on {right_on!r} would duplicate "
                f"left rows; pass allow_duplication=True (vaex join.py:173 parity)")

    # collision renaming (join.py:225-255)
    lcols = set(lsdf.columns)
    rename = {}
    for c in rsdf.columns:
        if c == right_on:
            continue  # join key: shared when on=, dropped when right_on=
        if c in lcols or lprefix or rprefix or lsuffix or rsuffix:
            newl = f"{lprefix}{c}{lsuffix}" if (lprefix or lsuffix) else c
            newr = f"{rprefix}{c}{rsuffix}" if (rprefix or rsuffix) else c
            if c in lcols and newl == newr == c:
                raise ValueError(f"column {c!r} collides; pass lsuffix/rsuffix")
            if newr != c:
                rename[c] = newr
    for old, new in rename.items():
        rsdf = rsdf.withColumnRenamed(old, new)
    if (lprefix or lsuffix):
        for c in list(lsdf.columns):
            if c != left_on and (c in set(rsdf.columns)):
                lsdf = lsdf.withColumnRenamed(c, f"{lprefix}{c}{lsuffix}")

    size = _size_hint_bytes(rsdf)
    if size is not None and size <= BROADCAST_LIMIT_BYTES:
        rsdf = F.broadcast(rsdf)

    if left_on == right_on:
        out = lsdf.join(rsdf, on=left_on, how=how)
    else:
        cond = lsdf[left_on] == rsdf[right_on]
        out = lsdf.join(rsdf, on=cond, how=how).drop(rsdf[right_on])
    if positional:
        out = out.drop(ROW_ID)

    o = DataFrame(out)
    o.variables = dict(left.variables)
    return o
