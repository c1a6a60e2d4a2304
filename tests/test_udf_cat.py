"""map_reduce / UDAF surface, categoricals, iterrows, active range, and
the isin large-set semi-join rewrite."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_map_reduce_sum(lineitem):
    got = lineitem.map_reduce(
        lambda q: float(np.sum(q)), lambda a, b: a + b, ["l_quantity"])
    want = float(lineitem.sum("l_quantity"))
    assert abs(got - want) < 1e-6


def test_map_reduce_multi_arg_minmax(lineitem):
    got = lineitem.map_reduce(
        lambda q, p: (float(np.min(q)), float(np.max(p))),
        lambda a, b: (min(a[0], b[0]), max(a[1], b[1])),
        ["l_quantity", "l_extendedprice"])
    assert got[0] == float(lineitem.min("l_quantity"))
    assert got[1] == float(lineitem.max("l_extendedprice"))


def test_pandas_agg_groupby(spark):
    import vaex_spark as vs
    from vaex_spark import agg as vagg
    df = vs.from_arrays(g=["a", "a", "b", "b", "b"], x=[1.0, 3.0, 2.0, 8.0, 5.0], spark=spark)
    out = df.groupby("g", agg={
        "spread": vagg.pandas_agg(lambda s: s.max() - s.min(), "x"),
        "n": vagg.count(),
    }, sort=True).spark.collect()
    rows = {r.g: r.spread for r in out}
    assert rows == {"a": 2.0, "b": 6.0}


def test_register_agg(spark):
    import vaex_spark as vs
    from vaex_spark import agg as vagg

    @vagg.register_agg("median_abs")
    def _median_abs(s):
        return float(s.abs().median())

    df = vs.from_arrays(g=["a", "a", "b"], x=[-1.0, 3.0, -4.0], spark=spark)
    out = df.groupby("g", agg={"m": vagg.registered("median_abs", "x")}, sort=True).spark.collect()
    assert {r.g: r.m for r in out} == {"a": 2.0, "b": 4.0}


def test_categorize_roundtrip(spark):
    import vaex_spark as vs
    df = vs.from_arrays(c=["r", "g", "b", "g", "r", "z"], spark=spark)
    df.categorize("c", labels=["b", "g", "r"])
    assert df.is_category("c")
    assert df.category_labels("c") == ["b", "g", "r"]
    assert df.category_count("c") == 3
    df["code"] = df.ordinal_values("c")
    codes = [r.code for r in df.spark.select("code").collect()]
    assert codes == [2, 1, 0, 1, 2, -1]  # z outside labels -> -1
    # labels[code] == value roundtrip (ignoring the out-of-set row)
    labels = df.category_labels("c")
    vals = [r.c for r in df.spark.select("c").collect()]
    assert all(labels[c] == v for c, v in zip(codes, vals) if c >= 0)
    # auto labels: sorted distinct
    df2 = vs.from_arrays(c=["x", "y", "x"], spark=spark).categorize("c")
    assert df2.category_labels("c") == ["x", "y"]


def test_iterrows_and_iter(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=[1, 2, 3], b=["x", "y", "z"], spark=spark)
    rows = list(df.iterrows())
    assert rows[0] == (0, {"a": 1, "b": "x"})
    assert len(rows) == 3
    assert list(df) == ["a", "b"]


def test_active_range_and_trim(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=list(range(10)), spark=spark)
    df.set_active_range(2, 7)
    assert df.count() == 5
    assert sorted(r.a for r in df.spark.collect()) == [2, 3, 4, 5, 6]
    t = df.trim()
    assert t.count() == 5
    df2 = vs.from_arrays(a=list(range(10)), spark=spark)
    df2.set_active_fraction(0.3)
    assert df2.count() == 3


def test_isin_large_set_semi_join(spark):
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(5000)), spark=spark)
    wanted = list(range(0, 5000, 2))  # 2500 values > literal threshold
    flt = df[df.k.isin(wanted)]
    assert flt.spark.count() == 2500
    plan = flt.spark._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # small lists stay literal (no join in plan)
    small = df[df.k.isin([1, 2, 3])]
    assert small.spark.count() == 3
    assert "LeftSemi" not in small.spark._jdf.queryExecution().executedPlan().toString()
    # expression algebra on the large form stays correct (falls back to
    # the array_contains column, no silent wrongness)
    inv = df[~df.k.isin(wanted)]
    assert inv.spark.count() == 2500


def test_register_function_on_expression_and_accessor(spark):
    import vaex_spark as vs
    from pyspark.sql import functions as F

    @vs.register_function(name="double_it")
    def double_it(c):
        return c * 2

    @vs.register_function(name="tripled", df_accessor="mymath")
    def tripled(c):
        return c * 3

    df = vs.from_arrays(x=[1.0, 2.0], spark=spark)
    assert sorted(df.x.double_it().evaluate().tolist()) == [2.0, 4.0]
    assert sorted(df.mymath.tripled(df.x).evaluate().tolist()) == [3.0, 6.0]
    # on_expression=False must NOT attach a method
    @vs.register_function(name="quad_it", on_expression=False)
    def quad_it(c):
        return c * 4
    assert not hasattr(type(df.x), "quad_it") or not callable(
        getattr(df.x, "quad_it", None))
