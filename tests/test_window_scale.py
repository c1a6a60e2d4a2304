"""Global-order window operators: correctness of the partition-boundary
exchange (operators/window.py) against the naive single-task global
window, plus a plan-shape assertion that the data path never funnels
through an Exchange SinglePartition."""

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _naive(sdf, col_expr, alias):
    return sdf.select("event_id", col_expr.alias(alias))


def _as_map(sdf, key, val):
    return {r[key]: r[val] for r in sdf.collect()}


def test_global_diff_matches_naive(events):
    got = events.diff(column="value", order_key="event_id").spark.select("event_id", "value")
    w = Window.orderBy("event_id")
    ref = _naive(events.spark, F.col("value") - F.lag("value").over(w), "value")
    assert _as_map(got, "event_id", "value") == _as_map(ref, "event_id", "value")


def test_global_shift_fill_matches_naive(events):
    got = events.shift(3, column="value", fill_value=-1.0, order_key="event_id").spark.select("event_id", "value")
    w = Window.orderBy("event_id")
    ref = _naive(events.spark, F.lag("value", 3, -1.0).over(w), "value")
    assert _as_map(got, "event_id", "value") == _as_map(ref, "event_id", "value")


def test_global_negative_shift_lead(events):
    got = events.shift(-2, column="value", order_key="event_id").spark.select("event_id", "value")
    w = Window.orderBy("event_id")
    ref = _naive(events.spark, F.lag("value", -2).over(w), "value")
    assert _as_map(got, "event_id", "value") == _as_map(ref, "event_id", "value")


@pytest.mark.parametrize("edge,lo,hi", [("right", -4, 0), ("left", 0, 4), ("center", -2, 2)])
def test_global_rolling_edges(events, edge, lo, hi):
    got = events.rolling(5, column="value", order_key="event_id", edge=edge).mean()
    got = got.spark.select("event_id", "value")
    w = Window.orderBy("event_id").rowsBetween(lo, hi)
    ref = _naive(events.spark,
                 F.when(F.count("value").over(w) >= 5, F.avg("value").over(w)), "value")

    def rnd(m):
        return {k: (None if v is None else round(v, 9)) for k, v in m.items()}

    assert rnd(_as_map(got, "event_id", "value")) == rnd(_as_map(ref, "event_id", "value"))


def test_rolling_trim_drops_incomplete(events):
    n = events.spark.count()
    trimmed = events.rolling(5, column="value", order_key="event_id", trim=True).mean()
    assert trimmed.spark.count() == n - 4
    # and no nulls remain
    assert trimmed.spark.filter(F.col("value").isNull()).count() == 0


def test_no_single_partition_data_exchange(events):
    """The scale guarantee: without partition_by, shift/diff must NOT
    plan a single-partition exchange over the data.  The only allowed
    SinglePartition is the metadata-sized partition-id map (a distinct
    over spark_partition_id, <= #partitions rows).  Advisory size is
    forced small so the input outgrows one partition — at fixture scale
    the n==1 fast path would otherwise (correctly) plan a single task."""
    spark = events.spark.sparkSession
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        out = events.diff(column="value", order_key="event_id").spark
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "REPARTITION_BY_NUM" in line:
            # stats-bounded explicit partition count: the catalog says
            # the input fits one advisory-sized partition, so a single
            # partition IS the right plan (it grows with the data)
            continue
        below = "\n".join(lines[i + 1:i + 3])
        assert re.search(r"HashAggregate\(keys=\[__rpid", below), (
            "data-path SinglePartition exchange found:\n" + "\n".join(lines[i - 3:i + 3]))
    # the total order must be range-partitioned once the input outgrows
    # one advisory partition; at fixture scale explicit-N may be 1, so
    # just assert the exchange came from the explicit-N path
    assert "rangepartitioning" in plan or "REPARTITION_BY_NUM" in plan


def test_shift_trim(spark):
    """Reference shift_test.py:200 — trim drops boundary rows."""
    import vaex_spark as vs
    df = vs.from_arrays(x=[0, 1, 2, 3], spark=spark)
    assert df.shift(1, "x", trim=True)["x"].tolist() == [0, 1, 2]
    df2 = vs.from_arrays(x=[0, 1, 2, 3], spark=spark)
    assert df2.shift(-1, "x", trim=True)["x"].tolist() == [1, 2, 3]


def test_shift_tuple_range(spark):
    """Reference shift_test.py:217-223: shift((0,2)) -> pairwise window
    arrays; trim drops incomplete windows."""
    import vaex_spark as vs
    x = [0, 1, 2, 3, 4]
    df = vs.from_arrays(x=x, spark=spark)
    got = df.shift((0, 2), "x")["x"].tolist()
    import math
    norm = [[None if (isinstance(e, float) and math.isnan(e)) else int(e)
             for e in v] for v in got]
    assert norm == [[0, 1], [1, 2], [2, 3], [3, 4], [4, None]]
    df2 = vs.from_arrays(x=x, spark=spark)
    got2 = df2.shift((0, 3), "x", trim=True)["x"].tolist()
    assert [list(v) for v in got2] == [[0, 1, 2], [1, 2, 3], [2, 3, 4]]
    # backward-looking window (the Rolling.array form)
    df3 = vs.from_arrays(x=x, spark=spark)
    got3 = df3.shift((-2, 0), "x", trim=True)["x"].tolist()
    assert [list(v) for v in got3] == [[0, 1], [1, 2], [2, 3]]


def test_donor_pass_is_filter_not_window(events):
    """The boundary-donor rows must come from plain filters over the
    range-exchanged data (mono-id row counters + broadcast count map),
    not from a second full-data row_number window: exactly ONE Window
    node may operate over the data partitioned by __pid.  Forced
    multi-partition (small advisory) so the donor path actually plans."""
    spark = events.spark.sparkSession
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        out = events.diff(column="value", order_key="event_id").spark
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    data_windows = [ln for ln in plan.splitlines()
                    if ln.strip().startswith(("Window", "+- Window", ":- Window"))
                    or ("Window [" in ln and ("__pid" in ln or "__ptag" in ln))]
    # r13: the data window partitions by __ptag (the monotonic-tag
    # bijection of __pid that keeps output partitions pid-ordered)
    pid_windows = [ln for ln in data_windows if "__pid" in ln or "__ptag" in ln]
    assert len(pid_windows) == 1, plan


def test_oversized_frame_raises_not_silent_nulls(spark):
    """A frame deeper than an interior range partition's row count can't
    be served by single-neighbor donation — it must raise with guidance,
    never return silently-null frames."""
    import vaex_spark as vs
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        df = vs.open("/root/testdata/sf0.1/events.parquet", spark=spark)
        with pytest.raises(Exception, match="frame depth exceeds"):
            df.shift(40000, column="value", order_key="event_id").spark.collect()
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")


def test_multi_partition_donation_exact(spark):
    """With a small advisory partition size (hundreds of real range
    partitions, ~200 rows each) the donor machinery must still reproduce
    the naive global window exactly — this is the configuration that
    exposed the branch-misalignment bug the persist() fixes."""
    import vaex_spark as vs
    from pyspark.sql import Window as W
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        df = vs.open("/root/testdata/sf0.1/events.parquet", spark=spark)
        got = df.shift(7, column="value", order_key="event_id").spark
        ref = df.spark.select(
            "event_id", F.lag("value", 7).over(W.orderBy("event_id")).alias("value"))
        g = {r["event_id"]: r["value"] for r in got.select("event_id", "value").collect()}
        r = {r["event_id"]: r["value"] for r in ref.collect()}
        assert sum(1 for k in r if g.get(k) != r[k]) == 0
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")


def test_partition_count_none_on_unknown_stats(spark):
    """A LogicalRDD input has no catalog stats — Catalyst substitutes
    spark.sql.defaultSizeInBytes (Long.MaxValue), which used to explode
    into ~200k near-empty range partitions and trip the frame-depth
    guard on valid queries.  Unknown stats must fall back to the
    session's shuffle partitioning (None)."""
    from vaex_spark.operators.window import _range_partition_count
    rdd = spark.sparkContext.parallelize([(i, float(i)) for i in range(100)])
    sdf = spark.createDataFrame(rdd, "i long, v double")
    assert _range_partition_count(sdf) is None


def test_partition_count_capped_after_join(spark):
    """Join stats are the product of child sizes (multiplicative
    overestimate); the derived partition count must stay within the
    parallelism-derived ceiling, never the old 200k blowup."""
    import vaex_spark as vs
    from vaex_spark.operators.window import _range_partition_count
    a = vs.from_arrays(k=list(range(2000)), x=[float(i) for i in range(2000)],
                       spark=spark)
    b = vs.from_arrays(k=list(range(2000)), y=[float(i) for i in range(2000)],
                       spark=spark)
    joined = a.join(b, on="k")._spark_df()
    n = _range_partition_count(joined)
    cap = 16 * max(spark.sparkContext.defaultParallelism,
                   int(spark.conf.get("spark.sql.shuffle.partitions")))
    assert n is None or 1 <= n <= cap


def test_shift_over_unknown_stats_input(spark):
    """shift() over a stats-free (RDD-backed) frame must succeed — the
    regression ADVICE r3 flagged: 200k tiny partitions made interior
    partitions thinner than the frame depth and hard-failed the guard."""
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.dataframe import DataFrame
    rdd = spark.sparkContext.parallelize([(i, float(i) * 2) for i in range(500)])
    df = DataFrame(spark.createDataFrame(rdd, "i long, v double"))
    out = (df.shift(3, column="v", order_key="i").spark
           .select("i", "v").toPandas().sort_values("i")["v"].to_numpy())
    exp = pd.Series([float(i) * 2 for i in range(500)]).shift(3).to_numpy()
    import numpy as np
    np.testing.assert_allclose(out, exp, equal_nan=True)


def test_rowid_pin_heuristic_inverted(spark):
    """Only plans made purely of deterministic nodes (scan/filter/
    project) skip the row-id pin; Sample/Limit/Generate — the nodes the
    old denylist missed — must persist (round-3 ADVICE)."""
    import vaex_spark as vs
    from vaex_spark.operators.rowid import _plan_is_deterministic

    def plan_of(sdf):
        return sdf._jdf.queryExecution().optimizedPlan().toString()

    base = vs.open("/root/testdata/sf0.001/nation.parquet", spark=spark)._spark_df()
    assert _plan_is_deterministic(plan_of(base))
    assert _plan_is_deterministic(plan_of(
        base.filter(F.col("n_regionkey") > 1).select("n_name")))
    assert not _plan_is_deterministic(plan_of(base.sample(0.5)))
    assert not _plan_is_deterministic(plan_of(base.limit(5)))
    assert not _plan_is_deterministic(plan_of(base.offset(2)))
    assert not _plan_is_deterministic(plan_of(
        base.select(F.explode(F.array(F.lit(1), F.lit(2))))))
    assert not _plan_is_deterministic(plan_of(base.orderBy("n_name")))
    assert not _plan_is_deterministic(plan_of(
        base.select(F.rand(7).alias("r"))))


def test_rowid_contiguous_after_sample(spark):
    """with_row_id downstream of sample(): ids must still be exactly
    0..n-1 (the counts branch and main branch read ONE pinned
    materialization, not two independent samples)."""
    import vaex_spark as vs
    from vaex_spark.operators.rowid import ROW_ID, with_row_id
    base = vs.open("/root/testdata/sf0.01/orders.parquet", spark=spark)._spark_df()
    sampled = base.sample(0.3, seed=None)  # nondeterministic on purpose
    out = with_row_id(sampled)
    ids = sorted(r[ROW_ID] for r in out.select(ROW_ID).collect())
    assert ids == list(range(len(ids))) and len(ids) > 0
    vs.cache.release_operator_caches()


@pytest.mark.parametrize("agg,edge", [
    ("sum", "right"), ("mean", "right"), ("count", "right"),
    ("var", "right"), ("std", "right"),
    ("sum", "left"), ("mean", "both"),
])
def test_wide_rolling_prefix_frames_exact(spark, agg, edge):
    """window >= 64 routes sum/mean/count/var/std through the growing-
    frame difference rewrite (O(1)/row instead of Spark's O(width)/row
    sliding recompute).  Forced multi-partition so the donor + prefix
    interplay is exercised; oracle = pandas rolling on the sorted data."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        df = vs.open("/root/testdata/sf0.01/events.parquet", spark=spark)
        window = 96
        r = getattr(df.rolling(window, column="value",
                               order_key="event_id", edge=edge), agg)()
        got = (r.spark.select("event_id", "value").toPandas()
               .sort_values("event_id").reset_index(drop=True))
        base = (df.spark.select("event_id", "value").toPandas()
                .sort_values("event_id").reset_index(drop=True))
        vals = base["value"].to_numpy(dtype=float)
        before = {"right": window - 1, "left": 0, "both": window // 2}[edge]
        sw = np.lib.stride_tricks.sliding_window_view(vals, window)
        aggfn = {"sum": lambda a: a.sum(axis=1),
                 "mean": lambda a: a.mean(axis=1),
                 "count": lambda a: np.full(a.shape[0], float(window)),
                 "var": lambda a: a.var(axis=1),
                 "std": lambda a: a.std(axis=1)}[agg]
        exp = np.full(len(vals), np.nan)
        exp[before:before + sw.shape[0]] = aggfn(sw)
        gv = got["value"].to_numpy(dtype=float)
        assert len(gv) == len(exp)
        both_nan = np.isnan(gv) & np.isnan(exp)
        close = np.isclose(gv, exp, rtol=1e-9, atol=1e-9)
        assert (both_nan | close).all(), (
            np.argwhere(~(both_nan | close))[:5], gv[:5], exp[:5])
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        vs = __import__("vaex_spark")
        vs.cache.release_operator_caches()


def test_wide_rolling_plans_growing_frames(events):
    """The >=64 rewrite must plan ROWS BETWEEN UnboundedPreceding frames
    (incremental), not a bounded sliding frame (O(width)/row)."""
    out = events.rolling(128, column="value", order_key="event_id").mean().spark
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "unboundedpreceding" in plan.lower(), plan
    # and the narrow window keeps the exact sliding frame
    out5 = events.rolling(5, column="value", order_key="event_id").mean().spark
    plan5 = out5._jdf.queryExecution().executedPlan().toString()
    assert "unboundedpreceding" not in plan5.lower(), plan5


def test_rolling_range_pandas_oracle(events):
    """Trailing time-range mean equals a pandas per-user time-window
    computation (inclusive (t-600, t] at second granularity)."""
    import pandas as pd
    from vaex_spark.operators.window import rolling_range
    out = rolling_range(events, 600, on="ts", column=["value"], agg="mean",
                        partition_by="user_id")
    got = (out.spark.select("event_id", "value_rolling_mean").toPandas()
           .set_index("event_id")["value_rolling_mean"])
    pdf = events.spark.select("event_id", "user_id", "ts", "value").toPandas()
    pdf["sec"] = pdf["ts"].astype("int64") // 10**9
    exp = {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("sec")
        for _, row in g.iterrows():
            frame = g[(g["sec"] >= row["sec"] - 599) & (g["sec"] <= row["sec"])]
            exp[row["event_id"]] = frame["value"].mean()
    assert len(got) == len(exp)
    for eid, v in list(exp.items())[:5000]:
        assert abs(got[eid] - v) < 1e-9, (eid, got[eid], v)


def test_sessionize_gaps_and_islands(spark):
    import vaex_spark as vs
    base = 1_700_000_000
    ts = [base, base + 100, base + 2000, base + 2100, base + 10_000,
          base, base + 5000]
    users = [1, 1, 1, 1, 1, 2, 2]
    import pandas as pd
    pdf = pd.DataFrame({"user_id": users,
                        "ts": pd.to_datetime(ts, unit="s"),
                        "event_id": range(7)})
    df = vs.DataFrame(spark.createDataFrame(pdf))
    out = (df.sessionize("ts", 1800, by="user_id").spark
           .select("event_id", "session_idx").collect())
    got = {r["event_id"]: r["session_idx"] for r in out}
    # user 1: events at +0,+100 (s0), +2000,+2100 (s1), +10000 (s2)
    # user 2: +0 (s0), +5000 (s1)
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 0, 6: 1}, got


def test_sessionize_property_random_gaps(spark):
    """Hypothesis: sessionize == a pure-python gaps-and-islands oracle
    over random per-user timestamp sets (one batched Spark pass per
    example set)."""
    from hypothesis import given, settings, strategies as st
    import pandas as pd
    import vaex_spark as vs

    ts_lists = st.lists(
        st.lists(st.integers(min_value=0, max_value=50_000),
                 min_size=1, max_size=30),
        min_size=1, max_size=5)

    @settings(max_examples=15, deadline=None)
    @given(ts_lists)
    def check(users):
        rows = []
        for u, tss in enumerate(users):
            for i, t in enumerate(sorted(tss)):
                rows.append((u, t, len(rows)))
        pdf = pd.DataFrame(rows, columns=["user_id", "sec", "event_id"])
        pdf["ts"] = pd.to_datetime(pdf["sec"] + 1_700_000_000, unit="s")
        df = vs.DataFrame(spark.createDataFrame(pdf[["user_id", "ts", "event_id"]]))
        got = {r["event_id"]: r["session_idx"] for r in
               df.sessionize("ts", 600, by="user_id").spark
               .select("event_id", "session_idx").collect()}
        exp = {}
        for u, tss in enumerate(users):
            idx, prev = -1, None
            srt = sorted(tss)
            eids = (pdf[pdf.user_id == u].sort_values("sec")["event_id"].tolist())
            for t, eid in zip(srt, eids):
                if prev is None or t - prev > 600:
                    idx += 1
                prev = t
                exp[eid] = idx
        assert got == exp, (got, exp)

    check()


def test_global_rolling_range_value_bucket_donation(spark):
    """Global (partition_by-less) rolling_range must equal the naive
    single-task global window exactly, for prefix aggs AND min/max,
    while planning the value-bucket donation (no data-path
    Exchange SinglePartition)."""
    import vaex_spark as vs
    from vaex_spark.operators.window import rolling_range
    from pyspark.sql import Window as W
    df = vs.open("/root/testdata/sf0.01/events.parquet", spark=spark)
    for agg, naive in (("mean", F.avg), ("sum", F.sum),
                       ("count", F.count), ("max", F.max)):
        out = rolling_range(df, 600, on="ts", column=["value"], agg=agg)
        got = {r["event_id"]: r[f"value_rolling_{agg}"] for r in
               out.spark.select("event_id", f"value_rolling_{agg}").collect()}
        ep = F.unix_timestamp("ts")
        wn = W.orderBy(ep).rangeBetween(-599, 0)
        exp = {r["event_id"]: r["m"] for r in
               df.spark.select("event_id",
                               naive(F.col("value")).over(wn).alias("m")).collect()}
        assert len(got) == len(exp)
        bad = [k for k in exp
               if not (got[k] == exp[k]
                       or abs(got[k] - exp[k]) < 1e-9)]
        assert not bad, (agg, bad[:5], got[bad[0]] if bad else None)
    # plan: the only SinglePartition may be the bounds aggregate, never
    # the windowed data path
    out = rolling_range(df, 600, on="ts", column=["value"], agg="mean").spark
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__tbk" in plan and "Window" in plan
    for ln in plan.splitlines():
        if "Exchange SinglePartition" in ln:
            raise AssertionError(plan)


def test_rolling_var_std_epoch_scale_no_cancellation(spark):
    """ADVICE r4: the wide-frame moment form (m2 - m1^2/n)/n cancels
    catastrophically for large-mean/small-variance data (epoch-like
    columns: mean^2/var >> 1/eps) and could go slightly negative,
    turning std into NaN via sqrt.  The centered rewrite (offset by the
    partition's first value) plus the >=0 clamp must match numpy to
    full precision even at mean ~ 1.7e9, sigma ~ 1e-3."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    rng = np.random.RandomState(11)
    n, window = 400, 64  # 64 triggers the growing-frame rewrite
    vals = 1.7e9 + rng.normal(0.0, 1e-3, n)
    df = vs.DataFrame(spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(n), "value": vals})))
    for agg, npf in (("var", lambda a: a.var(axis=1)),
                     ("std", lambda a: a.std(axis=1))):
        r = getattr(df.rolling(window, column="value",
                               order_key="event_id"), agg)()
        got = (r.spark.select("event_id", "value").toPandas()
               .sort_values("event_id")["value"].to_numpy(dtype=float))
        sw = np.lib.stride_tricks.sliding_window_view(vals, window)
        exp = np.full(n, np.nan)
        exp[window - 1:] = npf(sw)
        valid = ~np.isnan(exp)
        assert not np.isnan(got[valid]).any(), "NaN from negative variance"
        assert np.allclose(got[valid], exp[valid], rtol=1e-6, atol=1e-12), (
            agg, got[valid][:5], exp[valid][:5])
        both_nan = np.isnan(got[~valid]).all()
        assert both_nan


def test_rolling_range_global_empty_and_allnull(spark):
    """ADVICE r4: global rolling_range collected min/max epoch and did
    int(None) on an empty or all-null-timestamp frame.  Both must
    short-circuit to a null output column instead of raising."""
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.window import rolling_range
    empty = vs.DataFrame(spark.createDataFrame(
        [], schema="ts timestamp, value double"))
    out = rolling_range(empty, 600, on="ts", column=["value"], agg="mean")
    assert out.spark.count() == 0
    assert "value_rolling_mean" in out.spark.columns

    allnull = vs.DataFrame(spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime([None, None]),
                      "value": [1.0, 2.0]})))
    for agg in ("mean", "sum", "count", "max"):
        rows = rolling_range(allnull, 600, on="ts", column=["value"],
                             agg=agg).spark.collect()
        assert len(rows) == 2
        assert all(r[f"value_rolling_{agg}"] is None for r in rows), agg


def test_ntile_exact_matches_sql_ntile(spark):
    """ntile_exact == F.ntile over a single-task window, bit-identical,
    across non-divisible N, N < k, and forced-multi-partition configs."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from pyspark.sql import Window as W
    from vaex_spark.operators.window import ntile_exact
    rng = np.random.RandomState(17)
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        for n, k in ((9973, 10), (1000, 7), (5, 10), (64, 64), (12, 10)):
            vals = rng.uniform(0, 1, n)
            sdf = spark.createDataFrame(pd.DataFrame(
                {"id": np.arange(n), "v": vals}))
            got = {r["id"]: r["t"] for r in ntile_exact(
                sdf, k, ["v", "id"], out_col="t").select("id", "t").collect()}
            exp = {r["id"]: r["t"] for r in sdf.select(
                "id", F.ntile(k).over(W.orderBy("v", "id")).alias("t")).collect()}
            assert got == exp, (n, k)
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        vs.cache.release_operator_caches()


def test_ntile_exact_no_single_partition_exchange(spark):
    """The data path of ntile_exact must carry no Exchange
    SinglePartition when the frame spans multiple range partitions."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.window import ntile_exact
    rng = np.random.RandomState(23)
    n = 40_000
    sdf = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(n), "v": rng.uniform(0, 1, n)}))
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        out = ntile_exact(sdf, 10, ["v", "id"], out_col="t")
        out.count()  # materialize so the executed plan is final
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan
        assert "rangepartitioning" in plan.lower(), plan
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        vs.cache.release_operator_caches()


def test_global_rank_dense_and_total(spark):
    """global_rank assigns each row a unique 1..N rank consistent with
    the total order."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    rng = np.random.RandomState(29)
    n = 5000
    vals = rng.permutation(n).astype("int64")
    df = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(n), "v": vals})))
    out = df.global_rank("v", out_col="r").spark.select("v", "r").collect()
    assert sorted(r["r"] for r in out) == list(range(1, n + 1))
    for row in out:
        assert row["r"] == row["v"] + 1  # v is a permutation of 0..n-1


def test_rolling_range_bucket_seconds_invariant(events):
    """Global rolling_range results are IDENTICAL for any explicit
    bucket size >= 2*window (the donation-exactness contract the scale
    probes exploit as a self-consistency oracle)."""
    from vaex_spark.operators.window import rolling_range
    base = {r["event_id"]: r["value_rolling_mean"] for r in
            rolling_range(events, 600, on="ts", column=["value"],
                          agg="mean").spark
            .select("event_id", "value_rolling_mean").collect()}
    for S in (1200, 1999, 86_400):
        alt = {r["event_id"]: r["value_rolling_mean"] for r in
               rolling_range(events, 600, on="ts", column=["value"],
                             agg="mean", bucket_seconds=S).spark
               .select("event_id", "value_rolling_mean").collect()}
        assert alt.keys() == base.keys()
        for k, v in base.items():
            assert alt[k] == v or abs(alt[k] - v) < 1e-9, (S, k)


def test_global_asof_bucketed_matches_single_partition(spark):
    """Global (by=None) as-of join, forced multi-partition: the
    value-bucket + carry-prefix-scan plan must reproduce the naive
    single-window result exactly for all three directions, including
    rows whose nearest right row lives in an EARLIER bucket (sparse
    right side), and must not route the data through an Exchange
    SinglePartition (the bucket-count carry scan is exempt)."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    rng = np.random.RandomState(37)
    nl, nr = 20_000, 40  # sparse right: most buckets carry, not match
    lt = np.sort(rng.uniform(0, 1e6, nl))
    rt = np.sort(rng.uniform(0, 1e6, nr))
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"t": lt, "lid": np.arange(nl)})))
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"t": rt, "rv": np.arange(nr).astype("float64")})))
    try:
        for direction in ("backward", "forward", "nearest"):
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
            got = {r["lid"]: r["rv"] for r in
                   left.join_asof(right, on="t", direction=direction)
                   .spark.select("lid", "rv").collect()}
            plan = (left.join_asof(right, on="t", direction=direction)
                    .spark._jdf.queryExecution().executedPlan().toString())
            assert "__abkt" in plan, plan
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
            exp = {r["lid"]: r["rv"] for r in
                   left.join_asof(right, on="t", direction=direction)
                   .spark.select("lid", "rv").collect()}
            assert got == exp, direction
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "64MB")


def test_asof_split_hot_keys_matches_per_key_plan(spark):
    """join_asof(split_hot_keys=True): within-key bucketing + per-key
    carry prefix-scan must be bit-identical to the default per-key
    window across all directions, on a skewed key mix (one key holds
    90% of rows) with a sparse right side."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.join import join_asof
    rng = np.random.RandomState(41)
    n = 30_000
    keys = np.where(rng.rand(n) < 0.9, 0, rng.randint(1, 5, n))
    lt = rng.uniform(0, 1e6, n)
    left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"k": keys, "t": lt, "lid": np.arange(n)})))
    rk = rng.randint(0, 5, 60)
    rt = rng.uniform(0, 1e6, 60)
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"k": rk, "t": rt, "rv": np.arange(60).astype("float64")})))
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        for direction in ("backward", "forward", "nearest"):
            hot = {r["lid"]: r["rv"] for r in
                   join_asof(left, right, on="t", by="k",
                             direction=direction, split_hot_keys=True)
                   .spark.select("lid", "rv").collect()}
            plain = {r["lid"]: r["rv"] for r in
                     join_asof(left, right, on="t", by="k",
                               direction=direction, split_hot_keys=False)
                     .spark.select("lid", "rv").collect()}
            assert hot == plain, direction
        plan = (join_asof(left, right, on="t", by="k",
                          split_hot_keys=True)
                .spark._jdf.queryExecution().executedPlan().toString())
        assert "__abkt" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "64MB")


def test_asof_auto_hot_key_detection(spark):
    """split_hot_keys='auto' (the default): the key-skew probe flips to
    within-key bucketing when one key exceeds ~1/parallelism of rows,
    stays on the per-key plan for plentiful balanced keys, and skips
    the probe entirely for frames Catalyst places in one advisory
    partition — with identical results to both explicit settings in
    every regime."""
    import numpy as np
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark.operators.join import join_asof
    rng = np.random.RandomState(47)
    n = 30_000
    rk = rng.randint(0, 200, 80)
    rt = rng.uniform(0, 1e6, 80)
    right = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"k": rk, "t": rt, "rv": np.arange(80).astype("float64")})))

    def run(left, **kw):
        return {r["lid"]: r["rv"] for r in
                join_asof(left, right, on="t", by="k", **kw)
                .spark.select("lid", "rv").collect()}

    def plan_of(left, **kw):
        return (join_asof(left, right, on="t", by="k", **kw)
                .spark._jdf.queryExecution().executedPlan().toString())

    # 90%-hot mix vs 200 balanced keys, both multi-partition (8KB advisory)
    hot_keys = np.where(rng.rand(n) < 0.9, 0, rng.randint(1, 200, n))
    bal_keys = rng.randint(0, 200, n)
    lt = rng.uniform(0, 1e6, n)
    hot_left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"k": hot_keys, "t": lt, "lid": np.arange(n)})))
    bal_left = vs.DataFrame(spark.createDataFrame(pd.DataFrame(
        {"k": bal_keys, "t": lt, "lid": np.arange(n)})))
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        assert "__abkt" in plan_of(hot_left), "auto must bucket the hot mix"
        assert "__abkt" not in plan_of(bal_left), \
            "auto must keep the per-key plan for balanced keys"
        assert run(hot_left) == run(hot_left, split_hot_keys=True)
        assert run(bal_left) == run(bal_left, split_hot_keys=False)
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "64MB")
    # small frame at default advisory: no probe, per-key plan, same answer
    assert "__abkt" not in plan_of(hot_left)
    assert run(hot_left) == run(hot_left, split_hot_keys=False)


def test_positional_pre_ranged_skips_range_exchange(spark):
    """r12: positional (order_key=None) shift/diff ride the with_row_id
    layout — partition p already holds the contiguous id range in local
    order — so the plan must carry NO rangepartitioning exchange (one
    data exchange instead of two), and values must equal pandas over
    the construction order."""
    import pandas as pd

    import vaex_spark as vs
    vals = [float((i * 7) % 101) for i in range(4096)]
    df = vs.from_arrays(x=vals, spark=spark)
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                          "64MB")
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "8KB")
        out = df.diff(column="x").spark
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan.lower(), plan[:2000]
        got = [r["x"] for r in out.collect()]
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       prev)
    want = pd.Series(vals).diff().tolist()
    import math
    assert all((g is None and math.isnan(w)) or g == w
               for g, w in zip(got, want))


def test_positional_thin_interior_partition_exact(spark, tmp_path):
    """Thin INTERIOR scan partitions (small middle files) must not
    break positional windows.  r12 detected them from a counts probe
    and fell back to the classic range exchange; r13's _block_window
    makes the hazard structurally impossible — pid = ROW_ID div B is
    independent of physical partitioning, every block but the last
    holds exactly B >= depth rows.  Invariants stay exact either way:
    no raise, exact row/null counts."""
    import pandas as pd

    import vaex_spark as vs
    # file sizes 100/100/5/5: Spark orders splits by size desc, so the
    # 5-row files land AFTER the 100-row ones — the first 5-row file is
    # an interior partition thinner than the rolling depth below
    for name, n in [("a", 100), ("b", 100), ("c", 5), ("d", 5)]:
        pd.DataFrame({"x": [float(i) for i in range(n)]}).to_parquet(
            tmp_path / f"{name}.parquet")
    confs = {"spark.sql.files.maxPartitionBytes": "1KB",
             "spark.sql.files.openCostInBytes": "0",
             "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB"}
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = vs.open(str(tmp_path), spark=spark)
        sdf = df._spark_df()
        assert sdf.rdd.getNumPartitions() >= 4  # one split per file
        out = df.rolling(20, column="x").mean().spark
        rows = out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("x").isNull().cast("long")).alias("k"),
                       ).collect()[0]
        assert rows["n"] == 210 and rows["k"] == 19, dict(rows.asDict())
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_murmur3_tag_matches_spark_hash(spark):
    """The monotonic-exchange tags rely on a python reimplementation of
    Spark's Murmur3Hash.hashInt (seed 42) — pin it bit-exactly against
    F.hash over negatives, extremes, and the tag search range."""
    from vaex_spark.operators.window import _mmh3_int, _monotonic_tags
    probe = [0, 1, 2, 41, 42, 1337, -1, -42, 2**31 - 1, -(2**31)] + list(range(100, 140))
    rows = (spark.range(1)
            .select(*[F.hash(F.lit(int(v)).cast("int")).alias(f"h{i}")
                      for i, v in enumerate(probe)]).collect()[0])
    for i, v in enumerate(probe):
        assert rows[f"h{i}"] == _mmh3_int(v), (v, rows[f"h{i}"], _mmh3_int(v))
    # tag property: pmod(hash(t_i), m) == i
    for m in (2, 7, 32, 256):
        tags = _monotonic_tags(m)
        for i, t in enumerate(tags):
            h = _mmh3_int(t) % m
            assert (h + m if h < 0 else h) == i
    # PRODUCTION dtype pin (r14, from r13 ADVICE): _mmh3_int mirrors
    # hashInt only, so the __ptag column the exchange hashes must be a
    # 32-bit int — a literal-array inference change to bigint would
    # route through hashLong and silently scramble read-back order.
    from vaex_spark.operators.window import _PID, _PTAG, _pin_monotonic_exchange
    for pid_t in ("int", "bigint"):  # production is int; bigint defended
        aug = spark.range(64).withColumn(_PID, (F.col("id") / 8).cast(pid_t))
        pinned, _ = _pin_monotonic_exchange(aug, 8)
        assert dict(pinned.dtypes)[_PTAG] == "int", dict(pinned.dtypes)


def test_positional_output_row_order_multi_partition(spark):
    """Positional shift/diff output must come back in ROW ORDER even
    when the window runs across many explicit partitions (r13: a plain
    hashpartitioning(pid) exchange scrambles pid order across output
    partitions; the monotonic-tag exchange restores it).  r12 passed
    order checks only because AQE coalesced small frames to ONE
    partition — this pins the multi-partition shape explicitly."""
    import pandas as pd
    import vaex_spark as vs
    vals = [float((i * 13) % 257) for i in range(20000)]
    df = vs.from_arrays(x=vals, spark=spark)
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        out = df.diff(column="x").spark
        # the pinned exchange must produce MANY output partitions
        assert out.rdd.getNumPartitions() > 4
        got = [r["x"] for r in out.collect()]
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
    want = pd.Series(vals).diff().tolist()
    import math
    assert all((g is None and math.isnan(w)) or g == w
               for g, w in zip(got, want))
    # classic (order_key) path: output comes back in ORDER-KEY order
    import numpy as np
    rng = np.random.RandomState(3)
    keys = rng.permutation(20000).astype("int64")
    df2 = vs.from_arrays(k=keys, x=np.asarray(vals), spark=spark)
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        out2 = df2.shift(1, column="x", order_key="k").spark
        rows2 = out2.collect()
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
    got_k = [r["k"] for r in rows2]
    assert got_k == sorted(got_k), "classic path must read back key-ordered"
    by_key = {r["k"]: r["x"] for r in rows2}
    order = np.argsort(keys, kind="stable")
    xs = np.asarray(vals)[order]
    for j, k in enumerate(keys[order]):
        want_x = None if j == 0 else xs[j - 1]
        assert by_key[int(k)] == want_x, (k, by_key[int(k)], want_x)
