"""Scale-join strategies: bucketed co-located joins (no Exchange in the
physical plan) and skew salting (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from vaex_spark.operators import scale


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    import vaex_spark as vs
    warehouse = spark.conf.get("spark.sql.warehouse.dir", None)
    orders = vs.open("/root/testdata/sf0.001/orders.parquet", spark=spark)
    customer = vs.open("/root/testdata/sf0.001/customer.parquet", spark=spark)
    scale.export_bucketed(orders, "orders_b", by="o_custkey", n_buckets=8,
                          sort_by="o_custkey")
    scale.export_bucketed(customer, "customer_b", by="c_custkey", n_buckets=8,
                          sort_by="c_custkey")
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    to, tc = bucketed_tables
    o = scale.open_bucketed(to, spark=spark)
    c = scale.open_bucketed(tc, spark=spark)
    # disable broadcast so the join would otherwise shuffle both sides
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.spark.join(c.spark, o.spark["o_custkey"] == c.spark["c_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n > 0
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    import vaex_spark as vs
    to, tc = bucketed_tables
    o = scale.open_bucketed(to, spark=spark)
    c = scale.open_bucketed(tc, spark=spark)
    got = (o.spark.join(c.spark, o.spark["o_custkey"] == c.spark["c_custkey"])
           .count())
    orders = vs.open("/root/testdata/sf0.001/orders.parquet", spark=spark)
    customer = vs.open("/root/testdata/sf0.001/customer.parquet", spark=spark)
    want = (orders.spark.join(customer.spark,
                              orders.spark["o_custkey"] == customer.spark["c_custkey"])
            .count())
    assert got == want


def test_salted_join_matches_plain(spark):
    import vaex_spark as vs
    # skewed left: 90% of rows share key 1
    left = vs.from_arrays(k=[1] * 900 + list(range(2, 102)),
                          v=list(range(1000)), spark=spark)
    right = vs.from_arrays(k=list(range(1, 102)),
                           name=[f"n{i}" for i in range(1, 102)], spark=spark)
    got = scale.salted_join(left, right, on="k", salt=8)
    plain = left.spark.join(right.spark, on="k")
    assert got.count() == plain.count()
    assert (sorted(r.name for r in got.filter(F.col("k") == 1).select("name").distinct().collect())
            == ["n1"])


def test_salted_group_count_matches(spark):
    import vaex_spark as vs
    df = vs.from_arrays(k=[7] * 500 + [1, 2, 3] * 10, spark=spark)
    got = {r.k: r["count"] for r in scale.salted_group_count(df, "k", salt=4).collect()}
    assert got == {7: 500, 1: 10, 2: 10, 3: 10}


def _file_spans(path, cols):
    """Per parquet file: product of (max-min) spans of cols, from footer
    metadata only."""
    import glob
    import pyarrow.parquet as pq
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = {c: float("inf") for c in cols}
        hi = {c: float("-inf") for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    lo[name] = min(lo[name], col.statistics.min)
                    hi[name] = max(hi[name], col.statistics.max)
        area = 1.0
        for c in cols:
            area *= max(hi[c] - lo[c], 0.0)
        spans.append(area)
    return spans


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    """Z-ordered files must cover far less (x,y) area per file than a
    random layout -> parquet min/max pruning actually bites."""
    import numpy as np
    import vaex_spark as vs
    rng = np.random.RandomState(7)
    n = 20000
    df = vs.from_arrays(x=rng.rand(n) * 1000, y=rng.rand(n) * 1000, spark=spark)
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.spark.repartition(8).write.parquet(plain)
    df.export_zordered(zpath, ["x", "y"], n_files=8)
    plain_area = sum(_file_spans(plain, ["x", "y"]))
    z_area = sum(_file_spans(zpath, ["x", "y"]))
    assert z_area < plain_area * 0.5
    # and the data survives intact
    assert spark.read.parquet(zpath).count() == n


def test_clustered_layout_prunes_on_prefix(spark, tmp_path):
    import numpy as np
    import vaex_spark as vs
    rng = np.random.RandomState(8)
    n = 10000
    df = vs.from_arrays(k=rng.randint(0, 1000, n).astype("int64"), spark=spark)
    path = str(tmp_path / "clustered")
    df.export_clustered(path, "k", n_files=8)
    spans = _file_spans(path, ["k"])
    # each file covers ~1/8 of the key space (range partitioning)
    assert sum(spans) < 1000 * 8 * 0.3
    assert spark.read.parquet(path).count() == n


def test_join_intervals_matches_bruteforce(spark):
    """Bucketized overlap join == broadcast non-equi join == numpy
    brute force, including the one-emission-per-pair dedup when a pair
    shares many buckets."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.join import join_intervals
    rng = np.random.RandomState(9)
    n_l, n_r = 300, 200
    l_lo = rng.uniform(0, 100, n_l); l_hi = l_lo + rng.uniform(0.1, 25, n_l)
    r_lo = rng.uniform(0, 100, n_r); r_hi = r_lo + rng.uniform(0.1, 25, n_r)
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"lid": np.arange(n_l), "lo": l_lo, "hi": l_hi})))
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"rid": np.arange(n_r), "lo": r_lo, "hi": r_hi})))
    exp = {(i, j) for i in range(n_l) for j in range(n_r)
           if l_lo[i] < r_hi[j] and r_lo[j] < l_hi[i]}
    for bw in (None, 1.0, 5.0, 40.0):
        out = join_intervals(left, right, "lo", "hi", "lo", "hi",
                             bucket_width=bw)
        got = [(r["lid"], r["rid"]) for r in
               out.spark.select("lid", "rid").collect()]
        assert len(got) == len(set(got)), f"duplicate pairs at bw={bw}"
        assert set(got) == exp, (bw, len(got), len(exp))
