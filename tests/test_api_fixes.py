"""Regression tests for previously silent-wrong API paths:
lstrip/rstrip(to_strip), td.microseconds, sample(weights=),
unique(return_inverse=), nunique with selection, xor modes, and
projection narrowing through derived ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def strings(spark):
    import vaex_spark as vs
    return vs.from_arrays(s=["xxabcxx", "yyy", "abc", "xya"], spark=spark)


def test_lstrip_rstrip_to_strip(strings):
    df = strings
    df["l"] = df.s.str.lstrip("x")
    df["r"] = df.s.str.rstrip("x")
    df["b"] = df.s.str.strip("xy")
    rows = {r.s: (r.l, r.r, r.b) for r in df.spark.select("s", "l", "r", "b").collect()}
    assert rows["xxabcxx"] == ("abcxx", "xxabc", "abc")
    assert rows["yyy"] == ("yyy", "yyy", "")
    assert rows["xya"] == ("ya", "xya", "a")


def test_td_microseconds(spark):
    import datetime as dt
    import vaex_spark as vs
    t0 = dt.datetime(2020, 1, 1)
    deltas = [dt.timedelta(days=2, seconds=5, microseconds=678901),
              dt.timedelta(seconds=59, microseconds=1),
              dt.timedelta(hours=1)]
    df = vs.from_arrays(a=[t0] * 3, b=[t0 + d for d in deltas], spark=spark)
    df["td"] = df.b - df.a
    df["us"] = df.td.td.microseconds
    df["sec"] = df.td.td.seconds
    df["days"] = df.td.td.days
    got = [(r.days, r.sec, r.us) for r in df.spark.select("days", "sec", "us").collect()]
    want = [(d.days, d.seconds, d.microseconds) for d in deltas]
    assert got == want


def test_sample_weights(spark):
    import vaex_spark as vs
    # one row has overwhelming weight: it must (virtually) always appear
    df = vs.from_arrays(k=list(range(100)),
                        w=[1e9 if i == 7 else 1e-9 for i in range(100)], spark=spark)
    s = df.sample(n=1, weights="w")
    rows = s.spark.select("k").collect()
    assert len(rows) == 1 and rows[0].k == 7


def test_sample_weights_with_replacement(spark):
    """Multinomial draws: exactly n rows come back, repeats allowed, and
    the overwhelming-weight row dominates; zero-weight rows never drawn."""
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(50)),
                        w=[1e9 if i == 7 else 1e-12 for i in range(50)],
                        spark=spark)
    got = [r.k for r in df.sample(n=8, weights="w", replace=True)
           .spark.select("k").collect()]
    assert len(got) == 8 and set(got) == {7}  # with-replacement repeats
    # zero weights are excluded while positive mass exists
    df0 = vs.from_arrays(k=[1, 2, 3], w=[0.0, 5.0, 0.0], spark=spark)
    got = [r.k for r in df0.sample(n=6, weights="w", replace=True)
           .spark.select("k").collect()]
    assert len(got) == 6 and set(got) == {2}
    # distribution sanity: 1:3 weights over many draws land near 1:3
    dfr = vs.from_arrays(k=[0, 1], w=[1.0, 3.0], spark=spark)
    got = [r.k for r in dfr.sample(n=400, weights="w", replace=True,
                                   random_state=11).spark.select("k").collect()]
    frac1 = sum(got) / len(got)
    assert 0.65 < frac1 < 0.85  # expect 0.75; binomial sd ~ 0.022


def test_unique_return_inverse(spark):
    import vaex_spark as vs
    data = ["b", "a", "c", "a", "b", "b"]
    df = vs.from_arrays(v=data, spark=spark)
    vals, inv = df.unique("v", return_inverse=True)
    assert sorted(vals) == ["a", "b", "c"]
    assert [vals[i] for i in inv] == data


def test_nunique_selection_no_phantom_null(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1, 1, 2, None], g=[True, True, False, False], spark=spark)
    # within the selection x is all 1s and never null -> exactly 1
    assert df.nunique("x", selection=df["g"]) == 1
    # whole column: {1, 2, null} -> 3
    assert df.nunique("x") == 3
    # selection covering the null row counts it
    df.select(df["x"] != 1, mode="replace")  # rows 2 (x=2) and... null!=1 is null -> excluded
    assert df.nunique("x", selection=True) == 1
    # groupby-path descriptor with selection
    from vaex_spark import agg as vagg
    out = df.groupby(None, agg={"n": vagg.nunique("x", selection=df["g"])}).spark.collect()
    assert out[0].n == 1


def test_xor_modes(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=list(range(10)), spark=spark)
    f = df[df.x < 6].filter(df.x >= 3, mode="xor")  # (x<6) xor (x>=3): {0,1,2} | {6..9}
    got = sorted(r.x for r in f.spark.select("x").collect())
    assert got == [0, 1, 2, 6, 7, 8, 9]
    # expression-level ^ on booleans
    df["b"] = (df.x < 6) ^ (df.x >= 3)
    assert sorted(r.x for r in df[df.b].spark.select("x").collect()) == [0, 1, 2, 6, 7, 8, 9]
    # integral xor still bitwise
    df["ix"] = df.x ^ 1
    assert [r.ix for r in df.spark.select("ix").limit(2).collect()] == [1, 0]
    # named-selection xor
    df.select(df.x < 6)
    df.select(df.x >= 3, mode="xor")
    assert df.count(selection=True) == 7


def test_projection_survives_filter(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=[1, 2, 3], b=[4, 5, 6], x=[-1.0, 0.5, 2.0], spark=spark)
    sub = df[["a", "b"]]
    flt = sub[df.x > 0]  # filter on a column outside the projection
    assert flt.get_column_names() == ["a", "b"]
    assert flt.spark.columns == ["a", "b"]
    assert flt.spark.count() == 2
    ren = sub.rename("a", "aa")
    assert ren.get_column_names() == ["aa", "b"]
    assert ren.spark.columns == ["aa", "b"]
    drp = sub.drop("b")
    assert drp.get_column_names() == ["a"]


def test_len_memoized(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=list(range(5)), spark=spark)
    assert len(df) == 5
    assert df._len_cache[1] == 5
    df2 = df[df.a > 2]
    assert len(df2) == 2


def test_shape_dtypes_col_namespace(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=[1, 2, 3], sum=[4.0, 5.0, 6.0], spark=spark)  # 'sum' clashes with method
    assert df.shape == (3, 2)
    assert df.dtypes["a"] == "bigint"
    assert df.column_count() == 2
    # df.col survives name clashes with DataFrame methods
    expr = df.col.sum
    assert df.count(expr) == 3
    flt = df[df.a > 1]
    assert flt.length_original() == 3 and len(flt) == 2


def test_materialize_named_columns(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, 2.0], spark=spark)
    df["y"] = df.x * 2
    df["z"] = df.x + 1
    out = df.materialize(["y"])
    assert "y" in out._base.columns and "z" not in out._base.columns
    assert "y" not in out.virtual_columns and "z" in out.virtual_columns
    assert sorted(out.evaluate("z").tolist()) == [2.0, 3.0]


def test_unique_dropnan_and_array_type(spark):
    import numpy as np
    import pyarrow as pa
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, float("nan"), 2.0, None, 1.0], spark=spark)
    # numpy renders the (kept) null as nan, so count nans: plain keeps
    # BOTH the NaN and the null; dropnan removes only the true NaN
    assert sum(np.isnan(v) for v in df.unique("x")) == 2
    vals = df.unique("x", dropnan=True)
    assert sum(np.isnan(v) for v in vals) == 1
    assert sorted(df.unique("x", dropna=True).tolist()) == [1.0, 2.0]
    assert isinstance(df.unique("x", dropna=True, array_type="list"), list)
    assert isinstance(df.evaluate("x", array_type="arrow"), pa.Array)
    assert isinstance(df.evaluate("x", array_type="list"), list)


def test_agg_list_null_handling(spark):
    import vaex_spark as vs
    df = vs.from_arrays(k=["a", "a", "a"], v=[1, None, 2], spark=spark)
    import math
    keep = df.groupby("k", agg={"vals": vs.agg.list("v")}).to_pandas_df()
    got = list(keep["vals"][0])
    assert len(got) == 3 and sum(1 for v in got if v is None or
                                 (isinstance(v, float) and math.isnan(v))) == 1
    drop = df.groupby("k", agg={"vals": vs.agg.list("v", dropna=True)}).to_pandas_df()
    assert sorted(drop["vals"][0]) == [1, 2]


def test_map_nan_missing(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, float("nan"), None], spark=spark)
    out = df.x.map({1.0: "one"}, nan_value="was-nan", missing_value="was-null",
                   default_value="other")
    got = out.evaluate().tolist()
    assert got == ["one", "was-nan", "was-null"]


def test_join_inplace(spark):
    import vaex_spark as vs
    left = vs.from_arrays(k=[1, 2], a=[10, 20], spark=spark)
    right = vs.from_arrays(k=[1, 2], b=[100, 200], spark=spark)
    res = left.join(right, on="k", inplace=True)
    assert res is left
    assert sorted(left.to_pandas_df()["b"].tolist()) == [100, 200]


def test_delay_promises_everywhere(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, 2.0, 3.0], spark=spark)
    g = df.count(binby="x", shape=4, limits=[0, 4], delay=True)
    assert g.get().sum() == 3          # resolved promise, contract holds
    assert df.nop("x", delay=True).get() is None


def test_projected_get_column_names_flags(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1], y=[2], spark=spark)
    df["v"] = df.x + 1
    p = df[["x", "v"]]
    assert p.get_column_names() == ["x", "v"]
    assert p.get_column_names(virtual=False) == ["x"]


def test_ordinal_encode_lazy_flag(spark):
    import vaex_spark as vs
    df = vs.from_arrays(c=["b", "a", "b"], spark=spark)
    out = df.ordinal_encode("c", lazy=False)
    assert "c_ordinal" in out._base.columns
    assert sorted(out.evaluate("c_ordinal").tolist()) == [0, 1, 1]


# ---------------------------------------------------------------------------
# round-3 ADVICE regressions
# ---------------------------------------------------------------------------

def test_join_range_closed_right_boundary(spark):
    """closed='right'/'both' with hi an exact multiple of bucket_width:
    the boundary value val == hi must match (top bucket = floor(hi/w))."""
    import vaex_spark as vs
    left = vs.from_arrays(x=[1.0, 2.0, 3.0], id=[1, 2, 3], spark=spark)
    iv = vs.from_arrays(lo=[0.0, 2.0], hi=[2.0, 4.0], label=["a", "b"], spark=spark)
    for closed, expect in (
        ("right", [(1, "a"), (2, "a"), (3, "b")]),
        ("both", [(1, "a"), (2, "a"), (2, "b"), (3, "b")]),
        ("left", [(1, "a"), (2, "b"), (3, "b")]),
    ):
        out = left.join_range(iv, "x", "lo", "hi", how="inner",
                              bucket_width=1.0, closed=closed)
        got = sorted((r["id"], r["label"]) for r in out.spark.collect())
        assert got == expect, closed


def test_join_range_left_nulls_and_dups(spark):
    """Left-outer reconstruction must be null-safe and duplicate-safe:
    a left row with a null payload that matched must not ALSO appear
    null-padded, and duplicate left rows must each be emitted."""
    import pyarrow as pa
    import vaex_spark as vs
    t = pa.table({"x": pa.array([0.5, 0.5, 7.0], type=pa.float64()),
                  "p": pa.array([None, None, 9], type=pa.int64())})
    left = vs.from_arrow_table(t, spark=spark)
    iv = vs.from_arrays(lo=[0.0], hi=[1.0], label=["low"], spark=spark)
    out = left.join_range(iv, "x", "lo", "hi", how="left", bucket_width=1.0)
    rows = sorted(((r["x"], r["label"]) for r in out.spark.collect()),
                  key=lambda p: (p[0], p[1] or ""))
    # two duplicate matched rows survive; the non-matching row is padded once
    assert rows == [(0.5, "low"), (0.5, "low"), (7.0, None)]


def test_groupby_udaf_mix_null_keys(spark):
    """Mixed built-in + pandas-UDAF groupby must keep null-keyed groups
    (the recombination join is eqNullSafe)."""
    import pandas as pd
    import pyarrow as pa
    import vaex_spark as vs
    import vaex_spark.agg as vagg
    t = pa.table({"k": pa.array(["a", "a", None, None], type=pa.string()),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0], type=pa.float64())})
    df = vs.from_arrow_table(t, spark=spark)

    def halfsum(s: pd.Series) -> float:
        return float(s.sum()) / 2.0

    res = df.groupby("k").agg({"total": vagg.sum("v"),
                               "half": vagg.pandas_agg(halfsum, "v", "double")})
    got = {r["k"]: (r["total"], r["half"]) for r in res.spark.collect()}
    assert got["a"] == (3.0, 1.5)
    assert got[None] == (7.0, 3.5)


def test_isin_all_none_large_list(spark):
    """A large all-None isin list must not raise and matches nothing."""
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(100)), spark=spark)
    flt = df[df.k.isin([None] * 2000)]
    assert flt.count() == 0


def test_isin_large_lazy_scale_paths(spark):
    """r12: a large isin builds NO array literal eagerly (F.lit on a
    1M-element list is minutes of per-element py4j — caught by the 1e7
    scale probe).  The three scale paths compile to broadcast joins:
    filter (semi-join), .sum() (semi-join count), virtual column
    (flag join with the array_contains null contract); only genuine
    column algebra materializes the literal, with a warning, via one
    JSON transfer."""
    import warnings

    import vaex_spark as vs
    vals = list(range(0, 40_000, 2))
    df = vs.from_arrays(k=list(range(2000)) + [None], spark=spark)

    # .sum(): semi-join count, no literal
    e = df.k.isin(vals)
    assert e._col is None
    assert e.sum() == 1000
    assert e._col is None  # still never materialized

    # virtual column: flag join; nulls follow array_contains semantics
    df["flag"] = df.k.isin(vals)
    rows = {r["k"]: r["flag"] for r in df.spark.select("k", "flag").collect()}
    assert rows[0] is True and rows[2] is True
    assert rows[1] is False and rows[1999] is False
    assert rows[None] is None
    assert df.spark.filter(F.col("flag")).count() == 1000
    plan = df.spark._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # value set containing None: non-member -> null, member -> true
    df["flag2"] = df.k.isin(vals + [None])
    rows2 = {r["k"]: r["flag2"] for r in df.spark.select("k", "flag2").collect()}
    assert rows2[0] is True and rows2[1] is None and rows2[None] is None

    # column algebra: materializes (warned) and agrees with the joins
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        comp = df[df.k.isin(vals) & (df.k >= 0)]
        n = comp.count()
    assert n == 1000
    assert any("COLUMN" in str(x.message) for x in w)


def test_isin_rewrite_preserves_projection_and_renames(spark):
    """The large-set semi-join rewrite must keep _Projected narrowing and
    rename state."""
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(5000)), v=list(range(5000)), spark=spark)
    df = df.rename("v", "val")
    proj = df[["k", "val"]]
    flt = proj[proj.k.isin(list(range(0, 5000, 2)))]
    assert flt.get_column_names() == ["k", "val"]
    assert flt.count() == 2500
    assert "LeftSemi" in flt.spark._jdf.queryExecution().executedPlan().toString()


def test_to_dask_array_present_path(spark):
    """to_dask_array must pass `values` (a property) without calling it;
    mock a minimal dask so the present-path executes in this container."""
    import sys
    import types
    import vaex_spark as vs
    captured = {}
    fake_da = types.ModuleType("dask.array")

    def from_array(arr, chunks=None):
        captured["arr"] = arr
        captured["chunks"] = chunks
        return "dask-array"

    fake_da.from_array = from_array
    fake_dask = types.ModuleType("dask")
    fake_dask.array = fake_da
    old_dask = sys.modules.get("dask")
    old_da = sys.modules.get("dask.array")
    sys.modules["dask"] = fake_dask
    sys.modules["dask.array"] = fake_da
    try:
        df = vs.from_arrays(a=[1.0, 2.0], b=[3.0, 4.0], spark=spark)
        out = df.to_dask_array()
        assert out == "dask-array"
        assert isinstance(captured["arr"], np.ndarray)
        assert captured["arr"].shape == (2, 2)
    finally:
        for name, mod in (("dask", old_dask), ("dask.array", old_da)):
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


def test_dataframe_interchange_protocol(spark):
    """pd.api.interchange.from_dataframe must round-trip values+types."""
    import pandas as pd
    import vaex_spark as vs
    df = vs.from_arrays(a=[1, 2, 3], b=[1.5, 2.5, None],
                        s=["x", "y", "z"], spark=spark)
    obj = df.__dataframe__()
    assert obj.num_columns() == 3
    got = pd.api.interchange.from_dataframe(df)
    assert list(got.columns) == ["a", "b", "s"]
    assert got["a"].tolist() == [1, 2, 3]
    assert got["b"][:2].tolist() == [1.5, 2.5] and pd.isna(got["b"][2])
    assert got["s"].tolist() == ["x", "y", "z"]


def test_cat_row_range(spark):
    """cat(i1, i2) shows exactly rows [i1, i2) of the ordered frame."""
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(10)), spark=spark).sort("k")
    out = df.cat(2, 5, format="plain")
    assert "2" in out and "4" in out
    html = df.cat(0, 2)
    assert html.startswith("<table")


def test_release_operator_caches(spark):
    """Operator-internal persists are tracked and releasable in one
    sweep; subsequent calls re-persist transparently."""
    import vaex_spark as vs
    from vaex_spark.cache import release_operator_caches, _OP_PERSISTED
    release_operator_caches()
    df = vs.open("/root/testdata/sf0.001/events.parquet", spark=spark)
    # Force the multi-partition window path (the single-task fast path
    # skips the persist by design when stats say one advisory partition).
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        df.shift(1, column="value", order_key="event_id").spark.collect()
        assert len(_OP_PERSISTED) >= 1
        n = release_operator_caches()
        assert n >= 1 and not _OP_PERSISTED
        # operator still correct after release
        out = df.shift(1, column="value", order_key="event_id").spark
        assert out.count() == df.spark.count()
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        release_operator_caches()


def test_split_disjoint_exhaustive_after_shuffle(spark):
    """Splits of a shuffled (nondeterministically ordered) frame must be
    disjoint and exhaustive — row ids are pinned to one materialization."""
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(2000)), spark=spark).shuffle()
    parts = df.split([0.3, 0.3, 0.4])
    seen = []
    for p in parts:
        seen.extend(r["k"] for r in p.spark.select("k").collect())
    assert len(seen) == 2000
    assert sorted(seen) == list(range(2000))


def test_orc_round_trip(spark, tmp_path):
    import vaex_spark as vs
    df = vs.open("/root/testdata/sf0.001/nation.parquet", spark=spark)
    out = str(tmp_path / "nation.orc")
    df.export(out)
    back = vs.open(out, spark=spark)
    assert back.count() == df.count()
    assert sorted(back.get_column_names()) == sorted(df.get_column_names())
    a = df.to_pandas_df().sort_values("n_nationkey").reset_index(drop=True)
    b = back.to_pandas_df().sort_values("n_nationkey").reset_index(drop=True)
    assert a.equals(b)


def test_train_test_split_disjoint_on_shuffled(spark):
    """train/test of a shuffled frame must partition the rows exactly
    (row-id assignment pinned across the two slice evaluations)."""
    import warnings
    import vaex_spark as vs
    df = vs.from_arrays(k=list(range(1000)), spark=spark).shuffle()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        train, test = df.ml.train_test_split(test_size=0.25, verbose=False)
    a = [r["k"] for r in train.spark.select("k").collect()]
    b = [r["k"] for r in test.spark.select("k").collect()]
    assert len(a) == 750 and len(b) == 250
    assert sorted(a + b) == list(range(1000))


def test_pivot_explicit_and_discovered_domains_agree(spark):
    import vaex_spark as vs
    docs = vs.open("/root/testdata/sf0.001/documents.parquet", spark=spark)
    a = docs.pivot("source", "lang", "n_chars", agg="sum",
                   column_values=["de", "en", "es", "fr", "zh"]).to_pandas_df()
    b = docs.pivot("source", "lang", "n_chars", agg="sum").to_pandas_df()
    a = a.reindex(sorted(a.columns), axis=1).sort_values("source").reset_index(drop=True)
    b = b.reindex(sorted(b.columns), axis=1).sort_values("source").reset_index(drop=True)
    assert a.equals(b)


def test_pivot_cardinality_guard_raises_typed(spark):
    """A high-cardinality pivot column must fail with the library's own
    RowLimitException (vaex __init__.py:870 row_limit contract) before
    Spark's opaque pivotMaxValues error — and the discovery scan is
    bounded (limit(n+1)), not a full distinct materialization."""
    import pytest
    import vaex_spark as vs
    df = vs.DataFrame(spark.range(0, 5000).selectExpr(
        "id % 7 AS grp", "CAST(id AS STRING) AS wide_key", "id AS v"))
    with pytest.raises(vs.RowLimitException, match="column_limit=1000"):
        df.pivot("grp", "wide_key", "v", agg="sum")
    # raising the limit past the cardinality works
    out = df.pivot("grp", "wide_key", "v", agg="sum", column_limit=5000)
    assert len(out.get_column_names()) == 5001  # grp + 5000 value columns


def test_melt_round_trips_pivot(spark):
    """pivot -> melt reproduces the long-format aggregate."""
    import vaex_spark as vs
    docs = vs.open("/root/testdata/sf0.001/documents.parquet", spark=spark)
    wide = docs.pivot("source", "lang", "n_chars", agg="sum",
                      column_values=["de", "en", "es", "fr", "zh"])
    long = wide.melt("source", ["de", "en", "es", "fr", "zh"],
                     var_name="lang", value_name="chars")
    got = {(r["source"], r["lang"]): r["chars"]
           for r in long.spark.collect() if r["chars"] is not None}
    exp = {(r["source"], r["lang"]): r["chars"] for r in
           docs.spark.groupBy("source", "lang")
           .agg(F.sum("n_chars").alias("chars")).collect()}
    assert got == exp


def test_ansi_session_warns_once(spark):
    """Wrapping a frame over a session with ANSI on (the Spark 4
    default for foreign sessions) warns ONCE per session naming the
    fix.  As of round 11 the degenerate-DIVISION contract itself is
    ANSI-independent (try_divide/try_mod at every zero-capable site —
    see test_ansi_on_degenerate_division_parity), but overflow-wrap
    and bad-cast-to-null still silently depend on
    spark.sql.ansi.enabled=false, so the warning stays."""
    import warnings
    import vaex_spark as vs
    from vaex_spark import dataframe as dfm
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        # memo now lives ON the session wrapper (r11 ADVICE: id()-keyed
        # memoization can be silently skipped after id reuse)
        dfm._ANSI_WARNED.clear()
        if hasattr(spark, "_vaex_spark_ansi_warned"):
            del spark._vaex_spark_ansi_warned
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vs.DataFrame(spark.createDataFrame([(1,)], "x int"))
            vs.DataFrame(spark.createDataFrame([(2,)], "x int"))
        hits = [x for x in w if "ansi" in str(x.message).lower()]
        assert len(hits) == 1
        assert "get_session" in str(hits[0].message)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
        dfm._ANSI_WARNED.clear()
    # ansi off again: no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        vs.DataFrame(spark.createDataFrame([(3,)], "x int"))
    assert not [x for x in w if "ansi" in str(x.message).lower()]


def test_ansi_on_degenerate_division_parity(spark):
    """Round-11 contract: the degenerate-DIVISION semantics (zero-norm
    vector -> null cosine, zero-divisor expression -> null, constant
    scaler column -> null output, empty-set jaccard -> null) hold
    IDENTICALLY under spark.sql.ansi.enabled=true — every zero-capable
    division routes through try_divide/try_mod, which measures
    bit-identical to the non-ANSI operators and returns null instead
    of raising DIVIDE_BY_ZERO on ANSI-on (Spark 4 default) sessions.
    This is the r10 verdict's top task: before it, a frame wrapped
    over a foreign ANSI-on session crashed MID-JOB on the first
    zero-norm vector."""
    import vaex_spark as vs
    from vaex_spark.datapipe import similarity as S

    def battery():
        out = {}
        # planted degenerates: zero-norm, null-element, NaN-coord, NULL
        c = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0]),
             (2, [1.0, None, 0.0]), (3, None),
             (4, [float("nan"), 1.0, 0.0]), (5, [0.95, 0.05, 0.0])],
            "vec_id bigint, embedding array<double>")
        for strat in ("blocked", "dense", "auto"):
            out[f"nd_{strat}"] = sorted(map(tuple, S.embedding_near_dups(
                c, threshold=0.5, bits=2, n_tables=4,
                strategy=strat).collect()))
            vs.cache.release_operator_caches()
        q = [(0, [1.0, 0.0, 0.0]), (9, [0.0, 0.0, 0.0])]
        out["topk"] = sorted(map(tuple, S.brute_force_topk(
            c, q, k=3, strategy="expr").collect()))
        batch = spark.createDataFrame(
            [(10, [1.0, 0.01, 0.0]), (11, [0.0, 0.0, 0.0])],
            "vec_id bigint, embedding array<double>")
        out["screen"] = sorted(map(tuple,
            S.near_dup_embeddings_against_corpus(
                batch, c, threshold=0.5, bits=2, n_tables=4).collect()))
        vs.cache.release_operator_caches()
        # expression surface: /, //, % with planted zero divisors
        df = vs.from_arrays(x=[1.0, 0.0, 3.0], y=[0.0, 0.0, 2.0],
                            i=[5, 7, 0], j=[0, 2, 0])
        df["d"] = df.x / df.y
        df["fd"] = df.i // df.j
        df["md"] = df.i % df.j
        df["sd"] = df["x / y"]  # string-expression compiler path
        out["expr"] = [tuple(r) for r in
                       df._spark_df().select("d", "fd", "md", "sd").collect()]
        # array subscript out of bounds: null (try_element_at), not
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI
        av = vs.from_arrays(a=[[1.0, 2.0], [3.0]])
        out["getitem"] = [
            [r[0] for r in av._spark_df().select(av.a[1].col).collect()],
            [r[0] for r in av._spark_df().select(av["a[1]"].col).collect()]]
        # constant-column scaler: std/span/absmax = 0 -> null output
        sc = vs.from_arrays(v=[2.0, 2.0, 2.0])
        for T, kw in ((vs.ml.StandardScaler, {}),
                      (vs.ml.MinMaxScaler, {}),
                      (vs.ml.MaxAbsScaler, {})):
            t = T(features=["v"], **kw)
            fitted = t.fit_transform(vs.from_arrays(v=[0.0, 0.0, 0.0])
                                     if T is vs.ml.MaxAbsScaler else sc)
            cols = [c_ for c_ in fitted.get_column_names() if c_ != "v"]
            out[T.__name__] = [tuple(r) for r in
                               fitted._spark_df().select(*cols).collect()]
        return out

    def denan(obj):
        # NaN != NaN would fail the comparison; stringify floats
        import math
        if isinstance(obj, float):
            return "nan" if math.isnan(obj) else obj
        if isinstance(obj, (list, tuple)):
            return [denan(v) for v in obj]
        if isinstance(obj, dict):
            return {k: denan(v) for k, v in obj.items()}
        return obj

    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = battery()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        on = battery()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert denan(off) == denan(on)
    # and the results are the documented contract, not vacuous: the
    # zero-norm corpus row pairs with nothing, query 9 ranks null-cos
    assert not any(1 in p[:2] for p in off["nd_auto"])
    assert all(r[2] is None for r in off["topk"] if r[0] == 9)


def test_overflow_badcast_contract_ansi_off(spark):
    """Round-12 CONTRACT (the r11 verdict's contract call, decided):
    integer overflow WRAPS and invalid casts yield NULL — numpy parity
    (np.int64 wraps; vaex astype IS numpy astype), holding under
    spark.sql.ansi.enabled=false (the get_session() default).  We
    deliberately do NOT route +-* through try_add/try_multiply: those
    return NULL on overflow under BOTH conf values — a third semantics
    matching neither numpy nor ANSI.  Planted fixtures pin the wrap
    values bit-exactly against numpy."""
    import numpy as np
    import vaex_spark as vs
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        big = np.iinfo(np.int64).max
        df = vs.from_arrays(a=[big, big - 1, 0], b=[1, 2, 5], spark=spark)
        df["add"] = df.a + df.b
        df["mul"] = df.a * 2
        df["sub"] = -df.a - df.b
        got = df._spark_df().select("add", "mul", "sub").collect()
        with np.errstate(over="ignore"):
            wa = (np.array([big, big - 1, 0], dtype=np.int64)
                  + np.array([1, 2, 5], dtype=np.int64))
            wm = np.array([big, big - 1, 0], dtype=np.int64) * np.int64(2)
            ws = (-np.array([big, big - 1, 0], dtype=np.int64)
                  - np.array([1, 2, 5], dtype=np.int64))
        assert [r["add"] for r in got] == wa.tolist()
        assert [r["mul"] for r in got] == wm.tolist()
        assert [r["sub"] for r in got] == ws.tolist()
        # narrowing astype: numpy TRUNCATION + wrap semantics
        dfn = vs.from_arrays(x=[3.9e9, -1.5, 130.0, -3.9e9], spark=spark)
        dfn["i4"] = dfn.x.astype("int32")
        got32 = [r["i4"] for r in dfn._spark_df().select("i4").collect()]
        # SATURATE exception (SURVEY §1.2, round 13): Spark non-ANSI
        # out-of-range double->int clamps to int32 min/max (Java cast
        # semantics) where numpy astype would wrap — pinned explicitly
        # at BOTH boundaries; in-range values truncate like numpy
        assert got32[0] == np.iinfo(np.int32).max  # 3.9e9 saturates high
        assert got32[3] == np.iinfo(np.int32).min  # -3.9e9 saturates low
        assert got32[1] == -1 and got32[2] == 130
        # bad string cast -> NULL (never an error)
        dfs = vs.from_arrays(s=["12", "abc", None], spark=spark)
        dfs["v"] = dfs.s.astype("int")
        vals = [r["v"] for r in dfs._spark_df().select("v").collect()]
        assert vals == [12, None, None]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_overflow_badcast_ansi_on_raises(spark):
    """The SAME plants under spark.sql.ansi.enabled=true raise
    ARITHMETIC_OVERFLOW / CAST_INVALID_INPUT — the documented residue
    the once-per-session warning (or set_ansi_policy('error')) names.
    This is the other half of the round-12 contract pin: the behavior
    boundary is known and tested at BOTH conf values, not assumed."""
    import numpy as np
    import pytest
    import vaex_spark as vs
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        big = np.iinfo(np.int64).max
        df = vs.from_arrays(a=[big], b=[1], spark=spark)
        df["add"] = df.a + df.b
        with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
            df._spark_df().select("add").collect()
        dfs = vs.from_arrays(s=["abc"], spark=spark)
        dfs["v"] = dfs.s.astype("int")
        with pytest.raises(Exception, match="(?i)cast_invalid|invalid"):
            dfs._spark_df().select("v").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_ansi_policy_error_refuses_ansi_on_session(spark):
    """set_ansi_policy('error'): wrapping a frame over an ANSI-ON
    session raises EVERY time (never memo-suppressed), so the
    overflow/bad-cast contract cannot silently drift on shared
    ANSI-default clusters; ANSI-off sessions are unaffected, and the
    policy validates its input."""
    import pytest
    import vaex_spark as vs
    prev_conf = spark.conf.get("spark.sql.ansi.enabled", "false")
    prev_policy = vs.set_ansi_policy("error")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(ValueError, match="set_ansi_policy"):
            vs.DataFrame(spark.createDataFrame([(1,)], "x int"))
        # raises again — no memo suppression under 'error'
        with pytest.raises(ValueError, match="set_ansi_policy"):
            vs.DataFrame(spark.createDataFrame([(1,)], "x int"))
        spark.conf.set("spark.sql.ansi.enabled", "false")
        vs.DataFrame(spark.createDataFrame([(2,)], "x int"))  # fine
        with pytest.raises(ValueError, match="policy"):
            vs.set_ansi_policy("loud")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_conf)
        vs.set_ansi_policy(prev_policy)


def test_non_utc_session_warns_once(spark):
    """A foreign session with a non-UTC timezone SILENTLY shifts every
    datetime accessor/truncation/window — same foreign-session class as
    the ANSI warning, but with no error to catch, so the once-per-
    session warning is the only net."""
    import warnings

    import vaex_spark as vs
    from vaex_spark import dataframe as dfm
    prev = spark.conf.get("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        dfm._ANSI_WARNED.clear()
        if hasattr(spark, "_vaex_spark_ansi_warned"):
            del spark._vaex_spark_ansi_warned
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vs.DataFrame(spark.createDataFrame([(1,)], "x int"))
            vs.DataFrame(spark.createDataFrame([(2,)], "x int"))
        hits = [x for x in w if "timeZone" in str(x.message)]
        assert len(hits) == 1
        assert "America/New_York" in str(hits[0].message)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        dfm._ANSI_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        vs.DataFrame(spark.createDataFrame([(3,)], "x int"))
    assert not [x for x in w if "timeZone" in str(x.message)]


def test_state_roundtrip_odd_column_names(spark):
    """r13: virtual columns, selections, and filters built over
    NON-IDENTIFIER column names must survive state_get/state_set — the
    expression TEXT uses the reference's parseable df['a b'] spelling
    (utils.py:415 valid_expression), and expresso's df[...] subscript
    backtick-quotes dots so Spark does not read struct paths."""
    import numpy as np

    import vaex_spark as vs

    def fresh():
        return vs.from_arrays(**{"a b": np.array([1.0, 2.0, 3.0]),
                                 "c.d": np.array([4.0, 5.0, 6.0])},
                              spark=spark)

    odd = fresh()
    odd["dbl"] = odd["a b"] * 2
    odd["mix"] = odd["a b"] + odd["c.d"]
    odd.select("df['a b'] > 1.5")
    st = odd.state_get()
    assert st["virtual_columns"]["mix"] == "(df['a b'] + df['c.d'])"
    f2 = fresh()
    f2.state_set(st)
    assert f2["dbl"].tolist() == [2.0, 4.0, 6.0]
    assert f2["mix"].tolist() == [5.0, 7.0, 9.0]
    assert f2.count(selection=True) == 2
    # filter state too
    flt = fresh()
    flt = flt[flt["c.d"] >= 5.0]
    f3 = fresh()
    f3.state_set(flt.state_get())
    assert f3.count() == 2
    # string-expression subscript spelling works directly
    assert fresh()["df['a b'] * 3"].tolist() == [3.0, 6.0, 9.0]
