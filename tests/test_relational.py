"""Filters, joins, groupby, sort, concat, row ops — duckdb/numpy oracles.

Mirrors the reference join_test.py / groupby_test.py scenarios
(FIXTURES.md F5 join fixtures included)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def df_a(spark):
    import vaex_spark as vs
    return vs.from_arrays(spark=spark, a=["A", "B", "C"], x=[0.0, 1.0, 2.0],
                          y=[0.0, None, 2.0])


@pytest.fixture(scope="module")
def df_b(spark):
    import vaex_spark as vs
    return vs.from_arrays(spark=spark, b=["A", "B", "D"], xb=[2.0, 1.0, 0.0])


def test_join_left(df_a, df_b):
    j = df_a.join(df_b, left_on="a", right_on="b", how="left")
    pdf = j.to_pandas_df().sort_values("a").reset_index(drop=True)
    assert len(pdf) == 3
    assert pdf.loc[pdf.a == "C", "xb"].isna().all()  # no match -> null fill
    assert pdf.loc[pdf.a == "A", "xb"].iloc[0] == 2.0


def test_join_inner(df_a, df_b):
    j = df_a.join(df_b, left_on="a", right_on="b", how="inner")
    assert j.count() == 2


def test_join_right(df_a, df_b):
    j = df_a.join(df_b, left_on="a", right_on="b", how="right")
    pdf = j.to_pandas_df()
    assert len(pdf) == 3
    assert set(pdf["b"]) == {"A", "B", "D"}


def test_join_duplicate_guard(spark, df_a):
    import vaex_spark as vs
    df_dup = vs.from_arrays(spark=spark, b=["A", "B", "A"], v=[1, 2, 3])
    with pytest.raises(ValueError, match="duplicate"):
        df_a.join(df_dup, left_on="a", right_on="b")
    j = df_a.join(df_dup, left_on="a", right_on="b", allow_duplication=True)
    assert j.count() == 4  # A duplicated


def test_join_positional(spark):
    import vaex_spark as vs
    l = vs.from_arrays(spark=spark, x=[10, 20, 30])
    r = vs.from_arrays(spark=spark, y=[1, 2, 3])
    j = l.join(r)
    pdf = j.to_pandas_df().sort_values("x")
    np.testing.assert_array_equal(pdf["y"].values, [1, 2, 3])


def test_join_suffix_collision(spark):
    import vaex_spark as vs
    l = vs.from_arrays(spark=spark, k=["A", "B"], v=[1, 2])
    r = vs.from_arrays(spark=spark, k2=["A", "B"], v=[10, 20])
    j = l.join(r, left_on="k", right_on="k2", rsuffix="_r")
    names = set(j.get_column_names())
    assert "v" in names and "v_r" in names


def test_groupby_multi_key_sorted(lineitem):
    g = lineitem.groupby(["l_returnflag", "l_linestatus"],
                         agg={"l_quantity": "sum"}, sort=True)
    pdf = g.to_pandas_df()
    keys = list(zip(pdf.l_returnflag, pdf.l_linestatus))
    assert keys == sorted(keys)
    # oracle via duckdb
    import duckdb
    d = duckdb.connect().execute(
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) s "
        "FROM '/root/testdata/sf0.001/lineitem.parquet' GROUP BY 1,2 ORDER BY 1,2").df()
    np.testing.assert_allclose(pdf["l_quantity"].values, d["s"].values)


def test_groupby_agg_forms(lineitem):
    import vaex_spark as vs
    g1 = lineitem.groupby("l_returnflag", agg={"l_quantity": ["sum", "mean"]})
    assert {"l_quantity_sum", "l_quantity_mean"} <= set(g1.get_column_names())
    g2 = lineitem.groupby("l_returnflag", agg=vs.agg.sum("l_quantity"))
    assert "l_quantity_sum" in g2.get_column_names()
    g3 = lineitem.groupby("l_returnflag", agg="count")
    assert "count" in g3.get_column_names()


def test_groupby_binner_time(spark):
    import vaex_spark as vs
    import pandas as pd
    pdf = pd.DataFrame({"t": pd.date_range("2020-01-01", periods=100, freq="6h"),
                        "v": np.arange(100.0)})
    df = vs.from_pandas(pdf, spark=spark)
    g = df.groupby(vs.BinnerTime("t", resolution="D"), agg={"v": "sum"}, sort=True)
    out = g.to_pandas_df()
    assert len(out) == 25  # 100 * 6h = 25 days
    np.testing.assert_allclose(out["v"].sum(), np.arange(100.0).sum())


def test_grouper_limited(spark, lineitem):
    import vaex_spark as vs
    g = lineitem.groupby(vs.GrouperLimited("l_returnflag", ["A", "N"], other_value="other"),
                         agg="count", sort=True)
    pdf = g.to_pandas_df()
    assert set(pdf["l_returnflag"]) == {"A", "N", "other"}
    assert pdf["count"].sum() == 6000


def test_row_limit_guard(lineitem):
    import vaex_spark as vs
    with pytest.raises(vs.RowLimitException):
        lineitem.groupby("l_orderkey", agg="count", row_limit=10).count()


def test_sort_nulls_last(base_df):
    s = base_df.sort("m", ascending=True)
    vals = s.to_pandas_df()["m"].values
    assert np.isnan(vals[-2:]).all()  # nulls at the end
    s2 = base_df.sort("m", ascending=False)
    vals2 = s2.to_pandas_df()["m"].values
    assert np.isnan(vals2[-2:]).all()  # nulls at the end regardless of direction


def test_concat_flexible(spark):
    import vaex_spark as vs
    a = vs.from_arrays(spark=spark, x=[1, 2], y=[10.0, 20.0])
    b = vs.from_arrays(spark=spark, x=[3, 4])
    u = a.concat(b)
    pdf = u.to_pandas_df().sort_values("x")
    assert len(pdf) == 4
    assert pdf["y"].isna().sum() == 2


def test_slice_head_tail(lineitem):
    assert lineitem[10:20].count() == 10
    assert lineitem.head(5).count() == 5


def test_take(spark):
    import vaex_spark as vs
    df = vs.from_arrays(spark=spark, x=list(range(100)))
    t = df.take([0, 5, 7])
    assert sorted(t.to_pandas_df()["x"]) == [0, 5, 7]
    # numpy fancy-indexing semantics: rows come back in the ORDER GIVEN
    # (reference ColumnIndexed column.py:295), duplicates repeat (r13;
    # the bare semi-join returned row-id-sorted order)
    t2 = df.take([7, 0, 5, 7])
    assert t2.to_pandas_df()["x"].tolist() == [7, 0, 5, 7]
    # numpy negative-index wrap (r14; the reference's ColumnIndexed is
    # plain column[indices], column.py:295 — r13 fuzz found -1 silently
    # DROPPED by the broadcast join)
    t3 = df.take([0, -1, -100])
    assert t3.to_pandas_df()["x"].tolist() == [0, 99, 0]
    # out-of-bounds raises like numpy, both directions
    import pytest
    with pytest.raises(IndexError):
        df.take([100])
    with pytest.raises(IndexError):
        df.take([-101])


def test_sample_split_shuffle(lineitem):
    s = lineitem.sample(n=100, random_state=1)
    assert s.count() == 100
    parts = lineitem.split_random([0.5, 0.5], random_state=2)
    total = parts[0].count() + parts[1].count()
    assert total == 6000
    parts_seq = lineitem.split([0.25, 0.75])
    assert parts_seq[0].count() + parts_seq[1].count() == 6000


def test_filter_modes_and_drop_filter(lineitem):
    f = lineitem.filter("l_quantity > 25")
    n1 = f.count()
    f2 = f.filter("l_discount > 0.05", mode="and")
    assert f2.count() <= n1
    restored = f2.drop_filter()
    assert restored.count() == 6000
    hardened = f2.extract()
    assert hardened.count() == f2.count()


def test_rename_drop(base_df):
    r = base_df.rename("x", "xx")
    assert "xx" in r.get_column_names() and "x" not in r.get_column_names()
    d = base_df.drop("y")
    assert "y" not in d.get_column_names()


def test_shift_diff_rolling(events):
    d = events.diff(column="value", order_key="event_id")
    pdf = d.to_pandas_df().sort_values("event_id")
    raw = events.to_pandas_df().sort_values("event_id")
    expected = raw["value"].diff().values
    np.testing.assert_allclose(pdf["value"].values, expected, equal_nan=True)

    r = events.rolling(3, column="value", order_key="event_id").sum()
    got = r.to_pandas_df().sort_values("event_id")["value"].values
    exp = raw["value"].rolling(3).sum().values
    np.testing.assert_allclose(got, exp, equal_nan=True)


def test_state_roundtrip(lineitem, spark):
    import vaex_spark as vs
    df = lineitem._copy()
    df["vv"] = "l_quantity * 3"
    df.select("l_discount > 0.05")
    state = df.state_get()
    df2 = vs.open("/root/testdata/sf0.001/lineitem.parquet", spark=spark)
    df2.state_set(state)
    assert df2.vv.sum() == df.vv.sum()
    assert df2.count("vv", selection=True) == df.count("vv", selection=True)


def test_export_roundtrip(tmp_path, base_df, spark):
    import vaex_spark as vs
    p = str(tmp_path / "out.parquet")
    base_df.export_parquet(p)
    back = vs.open(p, spark=spark)
    assert back.count() == 21
    csv = str(tmp_path / "out.csv")
    base_df[["x", "y"]].export_csv(csv)
    back2 = vs.from_csv(csv, spark=spark)
    assert back2.count() == 21


def test_groupby_iteration_and_get_group(spark):
    import vaex_spark as vs
    df = vs.from_arrays(k=["a", "b", "a", "c"], v=[1, 2, 3, 4], spark=spark)
    g = df.groupby("k")
    got = {key: sorted(r.v for r in sub.spark.collect()) for key, sub in g}
    assert got == {"a": [1, 3], "b": [2], "c": [4]}
    assert sorted(g.groups) == ["a", "b", "c"]
    assert sorted(r.v for r in g.get_group("a").spark.collect()) == [1, 3]
    # multi-key
    df2 = vs.from_arrays(k1=["x", "x", "y"], k2=[1, 2, 1], v=[10, 20, 30], spark=spark)
    g2 = df2.groupby(["k1", "k2"])
    assert [r.v for r in g2.get_group(["x", 2]).spark.collect()] == [20]
    keys = set(g2.groups)
    assert keys == {("x", 1), ("x", 2), ("y", 1)}


def test_groupby_describe(spark):
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(k=["a", "a", "b"], v=[1.0, 3.0, 5.0], spark=spark)
    out = df.groupby("k", sort=True).describe("v").to_pandas_df()
    assert list(out["v_count"]) == [2, 1]
    assert list(out["v_count_na"]) == [0, 0]
    np.testing.assert_allclose(out["v_mean"], [2.0, 5.0])
    np.testing.assert_allclose(out["v_min"], [1.0, 5.0])
    np.testing.assert_allclose(out["v_max"], [3.0, 5.0])


def _asof_fixture(spark):
    import vaex_spark as vs
    left = vs.from_arrays(k=["a", "a", "a", "b", "b"],
                          t=[1.0, 5.0, 9.0, 2.0, 4.0],
                          lv=[10, 20, 30, 40, 50], spark=spark)
    right = vs.from_arrays(k=["a", "a", "b"],
                           t=[2.0, 5.0, 3.0],
                           rv=[100, 200, 300], spark=spark)
    return left, right


def _asof_expected(direction, allow_exact=True, tolerance=None):
    import pandas as pd
    lp = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "t": [1.0, 5.0, 9.0, 2.0, 4.0],
                       "lv": [10, 20, 30, 40, 50]}).sort_values("t")
    rp = pd.DataFrame({"k": ["a", "a", "b"], "t": [2.0, 5.0, 3.0],
                       "rv": [100, 200, 300]}).sort_values("t")
    out = pd.merge_asof(lp, rp, on="t", by="k", direction=direction,
                        allow_exact_matches=allow_exact, tolerance=tolerance)
    return out.sort_values("lv")["rv"].tolist()


def test_join_asof_directions(spark):
    import math
    left, right = _asof_fixture(spark)
    for direction in ("backward", "forward", "nearest"):
        out = left.join_asof(right, on="t", by="k", direction=direction)
        got = {r["lv"]: r["rv"] for r in out.spark.collect()}
        exp = _asof_expected(direction)
        got_list = [got[lv] for lv in [10, 20, 30, 40, 50]]
        norm = lambda xs: [None if (isinstance(x, float) and math.isnan(x)) or x is None else int(x) for x in xs]
        assert norm(got_list) == norm(exp), direction


def test_join_asof_exact_and_tolerance(spark):
    import math
    left, right = _asof_fixture(spark)
    out = left.join_asof(right, on="t", by="k", allow_exact_matches=False)
    got = {r["lv"]: r["rv"] for r in out.spark.collect()}
    exp = _asof_expected("backward", allow_exact=False)
    norm = lambda xs: [None if (isinstance(x, float) and math.isnan(x)) or x is None else int(x) for x in xs]
    assert norm([got[lv] for lv in [10, 20, 30, 40, 50]]) == norm(exp)
    out = left.join_asof(right, on="t", by="k", tolerance=1.0)
    got = {r["lv"]: r["rv"] for r in out.spark.collect()}
    exp = _asof_expected("backward", tolerance=1.0)
    assert norm([got[lv] for lv in [10, 20, 30, 40, 50]]) == norm(exp)


def test_join_asof_timestamps_no_by(spark):
    import datetime as dt
    import vaex_spark as vs
    base = dt.datetime(2024, 1, 1)
    left = vs.from_arrays(t=[base + dt.timedelta(seconds=s) for s in (10, 40)],
                          lv=[1, 2], spark=spark)
    right = vs.from_arrays(t=[base + dt.timedelta(seconds=s) for s in (5, 39)],
                           rv=[7, 8], spark=spark)
    out = left.join_asof(right, on="t", direction="backward")
    got = {r["lv"]: r["rv"] for r in out.spark.collect()}
    assert got == {1: 7, 2: 8}


def test_join_range_broadcast_and_bucketed(spark):
    import vaex_spark as vs
    left = vs.from_arrays(x=[0.5, 1.5, 2.5, 7.0], id=[1, 2, 3, 4], spark=spark)
    buckets = vs.from_arrays(lo=[0.0, 1.0, 2.0], hi=[1.0, 2.0, 3.0],
                             label=["low", "mid", "high"], spark=spark)
    for bw in (None, 1.0):
        out = left.join_range(buckets, "x", "lo", "hi", how="inner", bucket_width=bw)
        got = sorted((r["id"], r["label"]) for r in out.spark.collect())
        assert got == [(1, "low"), (2, "mid"), (3, "high")], bw
    out = left.join_range(buckets, "x", "lo", "hi", how="left", bucket_width=1.0)
    got = sorted(((r["id"], r["label"]) for r in out.spark.collect()),
                 key=lambda p: p[0])
    assert got[3] == (4, None)


def test_rollup_and_cube(lineitem):
    """rollup = hierarchical subtotal grouping sets; cube = all 2^k
    combinations.  Checked against an explicit union-of-groupbys oracle
    built from the same frame."""
    import pyspark.sql.functions as F
    base = lineitem.groupby(["l_returnflag", "l_linestatus"],
                            agg={"n": F.count(F.lit(1)).cast("long")}).to_pandas_df()
    per_flag = base.groupby("l_returnflag")["n"].sum()
    total = int(base["n"].sum())

    r = lineitem.rollup(["l_returnflag", "l_linestatus"],
                        agg={"n": F.count(F.lit(1)).cast("long")}).to_pandas_df()
    # detail + per-flag subtotals + grand total
    assert len(r) == len(base) + base["l_returnflag"].nunique() + 1
    sub = r[r["l_linestatus"].isna() & r["l_returnflag"].notna()]
    assert {t.l_returnflag: int(t.n) for t in sub.itertuples()} \
        == {k: int(v) for k, v in per_flag.items()}
    grand = r[r["l_returnflag"].isna() & r["l_linestatus"].isna()]
    assert len(grand) == 1 and int(grand["n"].iloc[0]) == total

    c = lineitem.cube(["l_returnflag", "l_linestatus"],
                      agg={"n": F.count(F.lit(1)).cast("long")}).to_pandas_df()
    # cube adds the per-linestatus level on top of rollup's sets
    assert len(c) == len(r) + base["l_linestatus"].nunique()
    per_status = c[c["l_returnflag"].isna() & c["l_linestatus"].notna()]
    assert {t.l_linestatus: int(t.n) for t in per_status.itertuples()} \
        == {k: int(v) for k, v in base.groupby("l_linestatus")["n"].sum().items()}
    # one-shuffle contract: the plan is a single Expand + Aggregate, not
    # a union of scans
    plan = r_plan = None
    sdf = lineitem.rollup(["l_returnflag", "l_linestatus"],
                          agg={"n": F.count(F.lit(1))}).spark
    plan = sdf._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") == 1 and "Union" not in plan


def test_groupby_apply_distributed_per_group(spark):
    """GroupBy.apply == pandas groupby.apply on the same function
    (per-group demeaning), and the plan is FlatMapGroupsInPandas, not a
    driver loop."""
    import pandas as pd
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.01/orders.parquet", spark=spark)

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_orderkey", "o_custkey"]].copy()
        out["resid"] = pdf["o_totalprice"] - pdf["o_totalprice"].mean()
        return out

    got = (df.groupby("o_custkey")
           .apply(demean, "o_orderkey long, o_custkey long, resid double"))
    plan = got.spark._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan
    gpd = got.spark.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    base = df.spark.select("o_orderkey", "o_custkey", "o_totalprice").toPandas()
    exp = (base.assign(resid=base["o_totalprice"]
                       - base.groupby("o_custkey")["o_totalprice"].transform("mean"))
           .sort_values("o_orderkey").reset_index(drop=True))
    assert len(gpd) == len(exp)
    assert (gpd["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    import numpy as np
    assert np.allclose(gpd["resid"].to_numpy(), exp["resid"].to_numpy(), atol=1e-9)


def test_groupby_apply_arrow_engine_matches_pandas(spark):
    """engine='arrow' (applyInArrow: fn(pyarrow.Table) -> Table) gives
    the same result as the pandas engine and plans FlatMapGroupsInArrow
    — the tiny-groups escape hatch that skips per-group pandas
    construction."""
    import numpy as np
    import pyarrow as pa
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.01/orders.parquet", spark=spark)

    def demean_arrow(tbl):
        price = tbl.column("o_totalprice").to_numpy()
        return pa.table({
            "o_orderkey": tbl.column("o_orderkey"),
            "o_custkey": tbl.column("o_custkey"),
            "resid": pa.array(price - price.mean(), type=pa.float64())})

    schema = "o_orderkey long, o_custkey long, resid double"
    got = (df.groupby("o_custkey").apply(demean_arrow, schema, engine="arrow"))
    plan = got.spark._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" in plan or "ArrowGroupMap" in plan, plan
    gpd = got.spark.toPandas().sort_values("o_orderkey").reset_index(drop=True)

    def demean(pdf):
        out = pdf[["o_orderkey", "o_custkey"]].copy()
        out["resid"] = pdf["o_totalprice"] - pdf["o_totalprice"].mean()
        return out

    exp = (df.groupby("o_custkey").apply(demean, schema)
           .spark.toPandas().sort_values("o_orderkey").reset_index(drop=True))
    assert (gpd["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    assert np.allclose(gpd["resid"].to_numpy(), exp["resid"].to_numpy(),
                       atol=1e-9)
    import pytest
    with pytest.raises(ValueError, match="engine"):
        df.groupby("o_custkey").apply(demean, schema, engine="polars")


def test_rollup_mixed_udaf_null_keys_grouping_id(spark):
    """ADVICE r4: rollup with mixed built-in + pandas-UDAF aggregates
    joins two grouped halves; on key columns alone a (a, NULL) subtotal
    row is indistinguishable from a genuine (a, null-keyed) group, so
    rows cross-matched and duplicated.  grouping_id() in the join key
    disambiguates: counts and UDAF values must pair 1:1."""
    import pandas as pd
    import vaex_spark as vs
    from vaex_spark import agg as vagg
    df = vs.DataFrame(spark.createDataFrame(pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": [None, None, "b1", "b2"],
        "v": [1.0, 2.0, 4.0, 8.0]})))
    out = df.rollup(["a", "b"], agg={
        "n": vagg.count(),
        "spread": vagg.pandas_agg(lambda s: s.max() - s.min(), "v"),
    }).to_pandas_df()
    # grouping sets: (x,null-group) (x,b1) (y,b2) detail, (x,·) (y,·)
    # subtotals, (·,·) grand total = 6 rows, NO duplicates
    assert len(out) == 6, out
    rows = {(r.a, r.b if isinstance(r.b, str) else None,
             int(r.n), float(r.spread)) for r in out.itertuples()}
    assert (("x", None, 2, 1.0) in rows       # the real null-keyed group
            or ("x", None, 3, 3.0) in rows)   # and the (x,·) subtotal
    # both must be present and distinct
    x_null = sorted((n, s) for a, b, n, s in rows if a == "x" and b is None)
    assert x_null == [(2, 1.0), (3, 3.0)], x_null
    grand = [(n, s) for a, b, n, s in rows if a is None]
    assert grand == [(4, 7.0)], grand
