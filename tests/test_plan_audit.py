"""Physical-plan audits: filters and projections must reach the parquet
scan (PushedFilters / ReadSchema), small dims must broadcast, and no
query may fall back to a cartesian product.  These guard exactly the
properties that decide 100 TB behavior but are invisible at test scale."""

import re

import pytest


def _plan(sdf) -> str:
    return sdf._sc._jvm.PythonSQLUtils.explainString(
        sdf._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.001/lineitem.parquet", spark=spark)
    flt = df[df.l_quantity > 45.0]
    plan = _plan(flt[["l_orderkey"]]._spark_df())
    assert "PushedFilters" in plan
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_quantity" in m.group(1), plan


def test_column_pruning_reaches_scan(spark):
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.001/lineitem.parquet", spark=spark)
    two = df[["l_orderkey", "l_quantity"]]
    plan = _plan(two._spark_df())
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_orderkey", "l_quantity"}, read_cols


def test_virtual_column_only_reads_inputs(spark):
    """A virtual column's scan must read only the columns it uses."""
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.001/lineitem.parquet", spark=spark)
    df["rev"] = df.l_extendedprice * (1 - df.l_discount)
    plan = _plan(df[["rev"]]._spark_df())
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_extendedprice", "l_discount"}, read_cols


def test_dim_join_broadcasts(spark):
    import vaex_spark as vs
    orders = vs.open("/root/testdata/sf0.001/orders.parquet", spark=spark)
    cust = vs.open("/root/testdata/sf0.001/customer.parquet", spark=spark)
    j = orders.join(cust, left_on="o_custkey", right_on="c_custkey",
                    how="inner", allow_duplication=True)
    plan = _plan(j._spark_df())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_headline_queries_have_no_cartesian(spark):
    """Every declared query plans without CartesianProduct (the q33
    brute-force top-k crossJoin is query-side-bounded and broadcast,
    which Spark plans as BroadcastNestedLoopJoin, not a cartesian)."""
    import __spark_entry__ as entry
    sf = "/root/testdata/sf0.001"
    for name, fn in entry.queries().items():
        sdf = fn(spark, sf)
        from vaex_spark.dataframe import DataFrame
        if isinstance(sdf, DataFrame):
            sdf = sdf._spark_df()
        plan = _plan(sdf)
        assert "CartesianProduct" not in plan, name
