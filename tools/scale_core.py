"""Core-relational engine at the reference's own ASV scale points.

The reference's reproducible baseline is workload DEFINITIONS at
N in {1e7, 5e7, 1e8} over a synthetic numerical table (reference
benchmarks/fixtures.py:26-73: x,y ~ N(0,1) float64 + float32 twins,
and iB_K int key columns at byte widths B in {1,2,4,8} and
cardinalities K in {10, 100, 1K, 1M}) and a 1e8-row sequential-string
table (fixtures.py:8-23).  The r11 verdict's top task: the datapipe
family has 1M-row probes, but the CORE engine's scale evidence
stopped at 6.4M rows — drive groupby/binby/value_counts/sort/isin/
filter/shift/rolling/strings at the reference's own N and record
wall + partition counts + invariants that need no oracle engine.

Probe map (reference file -> probe here):
  benchmarks/aggregates.py:35-128  -> stats, binby_cat, binby_grid
  benchmarks/groupbyh2o.py:39-93   -> h2o
  benchmarks/sort.py               -> sortby
  benchmarks/isin.py               -> isin_keys
  benchmarks/filter.py             -> filterops
  benchmarks/strings.py            -> stringops
  (shift/diff/rolling/value_counts are this engine's §2.6/§2.5
   surface at the same N — the verdict names them explicitly)

Fixtures are generated SPARK-SIDE (spark.range + xxhash64-derived
keys — no 1e8-element driver numpy array), deterministic, written
64-way so scans parallelize like real multi-file tables.

Usage: python tools/scale_core.py build [N ...]
       python tools/scale_core.py all|<probe> [N ...]
Default N sweep: 1e7 5e7 1e8.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BASE = "/tmp/scale_core"
DEFAULT_NS = [10**7, 5 * 10**7, 10**8]
# (cardinality-tag, n-distinct, [byte widths]) — fixtures.py:48-68
KEYS = [("10", 10, [1, 2, 4, 8]), ("100", 100, [1, 2, 4, 8]),
        ("1K", 1_000, [2, 4, 8]), ("1M", 1_000_000, [4, 8])]
_SQL_T = {1: "tinyint", 2: "smallint", 4: "int", 8: "bigint"}


def _spark():
    import os

    import vaex_spark as vs
    spark = vs.get_session(app_name="scale_core")
    if os.environ.get("VS_ANSI"):
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("# ansi conf: spark.sql.ansi.enabled=true")
    return spark


def _num_path(n: int) -> str:
    return f"{BASE}/num_{n}"


def _tag(n: int) -> str:
    return {10**7: "1e7", 5 * 10**7: "5e7", 10**8: "1e8"}.get(n, str(n))


def build(spark, ns):
    """Numerical fixture per N + the 1e7 string table (strings stay at
    1e7 — the reference's strings bench runs at 1e7; only its isin
    sweep touches 1e8 strings, noted in SCALECHECK)."""
    for n in ns:
        t0 = time.time()
        df = spark.range(0, n, 1, 64).select(
            F.col("id").alias("i8"),
            F.randn(41).alias("x"),
            F.randn(43).alias("y"))
        df = (df.withColumn("x4", F.col("x").cast("float"))
                .withColumn("y4", F.col("y").cast("float")))
        for tag, card, widths in KEYS:
            base = (F.pmod(F.xxhash64(F.col("i8"), F.lit(tag)), F.lit(card))
                    + F.lit(5))
            for b in widths:
                df = df.withColumn(f"i{b}_{tag}", base.cast(_SQL_T[b]))
        df.write.mode("overwrite").parquet(_num_path(n))
        print(f"build num N={_tag(n)}: {time.time()-t0:.1f}s")
    t0 = time.time()
    n_s = 10**7
    (spark.range(0, n_s, 1, 64)
          .select(F.col("id").cast("string").alias("xs"),
                  F.col("id").cast("string").alias("s"),
                  F.xxhash64("id").alias("__shuf"))
          .repartition(64, "__shuf").drop("__shuf")
          .write.mode("overwrite").parquet(f"{BASE}/strings_{n_s}"))
    print(f"build strings N=1e7 (hash-shuffled): {time.time()-t0:.1f}s")


def _open(spark, n):
    import vaex_spark as vs
    return vs.open(_num_path(n), spark=spark)


def _wall(label, fn):
    t0 = time.time()
    out = fn()
    w = time.time() - t0
    print(f"  {label}: {w:.2f}s")
    return out, w


def _noop(sdf):
    sdf.write.format("noop").mode("overwrite").save()
    return sdf


def _expected_distinct(card: int, n: int) -> tuple[float, float]:
    """Hashed-uniform draw of n values over card keys: expected number
    of distinct keys card*(1-e^(-n/card)), with ~Poisson spread on the
    empty-key count."""
    import math
    lam = n / card
    miss = card * math.exp(-lam)
    return card - miss, 5 * math.sqrt(max(miss, 1.0)) + 10


def stats(spark, ns):
    """aggregates.py Stats: count(*), mean(x), mean(x4)."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- stats N={_tag(n)} "
              f"(input partitions: {df.spark.rdd.getNumPartitions()})")
        c, _ = _wall("count_star", lambda: df.count())
        assert c == n, (c, n)
        m, _ = _wall("mean_x", lambda: df.mean("x"))
        assert abs(m) < 5 / n**0.5, m     # N(0,1): |mean| < 5 sigma/sqrt(N)
        m4, _ = _wall("mean_x4", lambda: df.mean("x4"))
        assert abs(m4) < 5 / n**0.5, m4


def binby_cat(spark, ns):
    """aggregates.py BinByCat{10,1K,1M}: dense count grid over the
    categorical keys — shape equals cardinality, so the 1M case is the
    grid-densify stress the verdict names (1M-bin dense vector on the
    driver, groupBy+pivot-free: one shuffle on the bin index)."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- binby_cat N={_tag(n)}")
        for tag, card, widths in KEYS:
            if tag == "100":
                continue   # reference binby sweeps 10/1K/1M
            for b in widths:
                col = f"i{b}_{tag}"
                grid, _ = _wall(f"binby_{col}", lambda col=col, card=card:
                                df.count(binby=col, shape=card,
                                         limits=[5, 5 + card]))
                assert int(grid.sum()) == n, (col, grid.sum())


def binby_grid(spark, ns):
    """aggregates.py BinBy1d/BinBy2d: 128-bin count over x in [-1,1]
    and the 128x128 (x,y) 2-d grid, float64 and float32."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- binby_grid N={_tag(n)}")
        g1, _ = _wall("count_binby_x_128",
                      lambda: df.count(binby="x", shape=128, limits=[-1, 1]))
        gx, _ = _wall("count_x_binby_x_128",
                      lambda: df.count("x", binby="x", shape=128,
                                       limits=[-1, 1]))
        g2, _ = _wall("count_binby_xy_128x128",
                      lambda: df.count(binby=["x", "y"], shape=128,
                                       limits=[[-1, 1], [-1, 1]]))
        g24, _ = _wall("count_binby_x4y4_128x128",
                       lambda: df.count(binby=["x4", "y4"], shape=128,
                                        limits=[[-1, 1], [-1, 1]]))
        # P(|N(0,1)|<1) ~ 0.6827 per axis
        assert abs(g1.sum() / n - 0.6827) < 0.01, g1.sum()
        assert abs(g2.sum() / n - 0.6827**2) < 0.01, g2.sum()
        assert g2.shape == (128, 128) and g24.shape == (128, 128)
        assert int(gx.sum()) == int(g1.sum())  # count('x') == count(*) here


def groupby_cat(spark, ns):
    """aggregates.py GroupByCat{10,1K,1M}: groupby(key, agg='count')."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- groupby_cat N={_tag(n)}")
        # i4_1M_POT mirrors benchmarks/groupby.py:19 — keys spread by a
        # power of two (classic hash-distribution stressor; Murmur3
        # must not degenerate on low-entropy bits)
        df["i4_1M_POT"] = df.i4_1M * 256
        for col, card in [("i1_10", 10), ("i8_10", 10), ("i2_1K", 1_000),
                          ("i8_1K", 1_000), ("i4_1M", 1_000_000),
                          ("i8_1M", 1_000_000), ("i4_1M_POT", 1_000_000)]:
            # groupby is lazy — the wall must include execution (noop sink)
            out, _ = _wall(f"groupby_{col}", lambda col=col:
                           _noop(df.groupby(col, agg="count").spark))
            rows = out.agg(
                F.count(F.lit(1)).alias("g"),
                F.sum("count").alias("s")).collect()[0]
            exp, tol = _expected_distinct(card, n)
            assert abs(rows["g"] - exp) < tol and rows["s"] == n, \
                (col, dict(rows.asDict()), exp, tol)


def h2o(spark, ns):
    """groupbyh2o.py q01-q05, q07, q10 on the reference's own column
    mapping (id1/2/4/5=i1_100, id3/id6=i4_1M, v1/v2=i1_10, v3=x4)."""
    import vaex_spark.agg as vagg
    for n in ns:
        df = _open(spark, n)
        for a, b in [("id1", "i1_100"), ("id2", "i1_100"), ("id3", "i4_1M"),
                     ("id4", "i1_100"), ("id5", "i1_100"), ("id6", "i4_1M"),
                     ("v1", "i1_10"), ("v2", "i1_10"), ("v3", "x4")]:
            df[a] = df[b]
        print(f"-- h2o N={_tag(n)}")
        def _sum_col(out, c):
            return out.agg(F.sum(c).alias("s")).collect()[0]["s"]

        # groupby is lazy — each wall includes execution via a noop sink
        q1, _ = _wall("q01 sum v1 by id1", lambda:
                      _noop(df.groupby(["id1"], agg={"v1": "sum"}).spark))
        tot_v1 = _sum_col(q1, "v1")
        q2, _ = _wall("q02 sum v1 by id1,id2", lambda:
                      _noop(df.groupby(["id1", "id2"],
                                       agg={"v1": "sum"}).spark))
        assert _sum_col(q2, "v1") == tot_v1
        q3, _ = _wall("q03 sum v1 / mean v3 by id3", lambda:
                      _noop(df.groupby(["id3"],
                                       agg={"v1": vagg.sum("v1"),
                                            "v3": vagg.mean("v3")}).spark))
        assert _sum_col(q3, "v1") == tot_v1
        _wall("q04 mean v1,v2,v3 by id4", lambda:
              _noop(df.groupby(["id4"], agg={"v1": vagg.mean("v1"),
                                             "v2": vagg.mean("v2"),
                                             "v3": vagg.mean("v3")}).spark))
        q5, _ = _wall("q05 sum v1,v2,v3 by id6 (1M keys)", lambda:
                      _noop(df.groupby(["id6"],
                                       agg={"v1": vagg.sum("v1"),
                                            "v2": vagg.sum("v2"),
                                            "v3": vagg.sum("v3")}).spark))
        assert _sum_col(q5, "v1") == tot_v1
        _wall("q07 max v1 / min v2 by id3", lambda:
              _noop(df.groupby(["id3"], agg={"v1": vagg.max("v1"),
                                             "v2": vagg.min("v2")}).spark))
        q10, _ = _wall("q10 sum v3/count by 6 keys", lambda:
                       _noop(df.groupby(
                           ["id1", "id2", "id3", "id4", "id5", "id6"],
                           agg={"v3": vagg.sum("v3"),
                                "v1": vagg.count("v1")}).spark))
        assert _sum_col(q10, "v1") == n   # count over all groups == N


def sortby(spark, ns):
    """sort.py: total sort by a 100-key, a 1M-key int column and the
    string column.  Materialized with a noop write (the reference's
    .sort() eagerly builds the take-order index)."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- sortby N={_tag(n)}")
        for col in ("i8_100", "i8_1M"):
            # sort is lazy — the wall is the materialized total sort
            s, _ = _wall(f"sort_{col}", lambda col=col:
                         _noop(df.sort(col)._spark_df()))
            head = df.sort(col).head(3).to_pandas_df()
            assert head[col].is_monotonic_increasing
    import vaex_spark as vs
    dfs = vs.open(f"{BASE}/strings_{10**7}", spark=spark)
    _wall("sort_strings_1e7", lambda: _noop(dfs.sort("s")._spark_df()))
    assert dfs.sort("s").head(2).to_pandas_df()["s"].tolist() == ["0", "1"]


def isin_keys(spark, ns):
    """isin.py: membership of M in {1,10,100,1K,1M} sampled values
    against the 1M-cardinality int column, and against 1e7 strings.
    Invariant: the expression-path count equals an independent
    broadcast-join count."""
    import vaex_spark as vs
    for n in ns:
        df = _open(spark, n)
        print(f"-- isin_keys N={_tag(n)}")
        for m in (1, 10, 100, 1_000, 1_000_000):
            vals = [5 + (v * 999_983) % 1_000_000 for v in range(m)]
            cnt, _ = _wall(f"isin_i8_1M M={m}", lambda vals=vals:
                           df[df.i8_1M.isin(vals)].count())
            expect = (df.spark.join(
                spark.createDataFrame([(v,) for v in set(vals)],
                                      "i8_1M bigint").hint("broadcast"),
                "i8_1M", "left_semi").count())
            assert cnt == expect, (m, cnt, expect)
    dfs = vs.open(f"{BASE}/strings_{10**7}", spark=spark)
    for m in (10, 1_000):
        svals = [str((v * 999_983) % 10**7) for v in range(m)]
        cnt, _ = _wall(f"isin_str M={m}", lambda svals=svals:
                       dfs[dfs.s.isin(svals)].count())
        assert cnt == len(set(svals)), (m, cnt)   # s is unique 0..N-1


def filterops(spark, ns):
    """filter.py: dff = df[(x>0)&(y<0)]; head / tail / count('i1_100')."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- filterops N={_tag(n)}")
        dff = df[(df.x > 0) & (df.y < 0)]
        c, _ = _wall("filter_count", lambda: dff.count("i1_100"))
        assert abs(c / n - 0.25) < 0.005, c     # independent half-planes
        h, _ = _wall("filter_head", lambda: dff.head(10).to_pandas_df())
        assert len(h) == 10 and (h["x"] > 0).all() and (h["y"] < 0).all()
        t, _ = _wall("filter_tail", lambda: dff.tail(10).to_pandas_df())
        assert len(t) == 10 and (t["x"] > 0).all() and (t["y"] < 0).all()


def value_counts(spark, ns):
    """§2.5 value_counts at the reference N (verdict-named)."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- value_counts N={_tag(n)}")
        for col, card in [("i8_1K", 1_000), ("i8_1M", 1_000_000)]:
            vc, _ = _wall(f"value_counts_{col}",
                          lambda col=col: df.value_counts(col))
            exp, tol = _expected_distinct(card, n)
            assert abs(len(vc) - exp) < tol and int(vc.sum()) == n, \
                (col, len(vc), exp)


def shift_rolling(spark, ns):
    """§2.6 global-order shift / diff / rolling at the reference N.
    diff telescopes: sum(diff(i8)) == last - first == N-1 exactly.
    rolling mean over the SEQUENTIAL column has the closed form
    mean(i8[k-w+1..k]) = k - (w-1)/2."""
    for n in ns:
        df = _open(spark, n)
        print(f"-- shift_rolling N={_tag(n)}")
        # all three are lazy — each wall executes via a noop sink
        sh, _ = _wall("shift_1", lambda:
                      _noop(df.shift(1, column="x", order_key="i8").spark))
        nn = sh.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").isNull().cast("long")).alias("k")).collect()[0]
        assert nn["n"] == n and nn["k"] == 1, dict(nn.asDict())
        d, _ = _wall("diff_i8", lambda:
                     _noop(df.diff(column="i8", order_key="i8").spark))
        s = d.agg(F.sum("i8").alias("s")).collect()[0]["s"]
        assert s == n - 1, s
        # positional (order_key=None) twin: rides the with_row_id
        # layout, r12 pre_ranged fast path — one data exchange, no
        # repartitionByRange
        shp, _ = _wall("shift_1_positional", lambda:
                       _noop(df.shift(1, column="x").spark))
        np_ = shp.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").isNull().cast("long")).alias("k")).collect()[0]
        assert np_["n"] == n and np_["k"] == 1, dict(np_.asDict())
        w = 64
        r, _ = _wall(f"rolling_mean_w{w}", lambda:
                     _noop(df.rolling(w, column="i8",
                                      order_key="i8").mean().spark))
        chk = r.agg(
            F.sum(F.col("i8").isNull().cast("long")).alias("nulls"),
            F.sum("i8").alias("s")).collect()[0]
        assert chk["nulls"] == w - 1, dict(chk.asDict())
        # sum over k=w-1..N-1 of (k-(w-1)/2) = (N-w+1)(N-1)/2 exactly
        expect = (n - w + 1) * (n - 1) / 2.0
        assert abs(chk["s"] - expect) / expect < 1e-12, (chk["s"], expect)


def wide_rolling_tail(spark, ns):
    """r13 verdict task 5: the donor-edge tail of the r13 block scheme
    (`_block_window`): blocks are ``B = max(ceil(N/n_blocks), depth)``,
    so at frame depth approaching B every block donates ~ALL its rows
    to its successor — shuffle volume tends to 2× (never more:
    single-neighbor donation requires B >= depth, so a row is donated
    at most once) and parallelism tends to N/depth blocks.  Pinned
    here: (a) EXACTNESS at 1e7 w=100k via a full-output numpy-cumsum
    oracle — at this N the clamp B = depth is active, i.e. exactly the
    depth == B regime the verdict asked about; (b) count == N and
    nulls == w-1 at every N/width — the donation-depth invariant (a
    short-donated block head would null its first w-1 rows PER BLOCK);
    (c) walls for w=100k, w ≈ B (the full-duplication point at 1e8),
    and the documented parallelism-loss regime w=1M at 1e7 (11
    blocks of 2M sorted rows each)."""
    import numpy as np
    for n in ns:
        df = _open(spark, n)
        print(f"-- wide_rolling_tail N={_tag(n)}")
        widths = [100_000]
        if n >= 5 * 10**7:
            widths.append(-(-n // 512))  # w ≈ B: full-duplication point
        if n == 10**7:
            widths.append(1_000_000)
        for w in widths:
            r, _ = _wall(f"rolling_sum_w{w}_positional", lambda:
                         _noop(df.rolling(w, column="x").sum().spark))
            chk = r.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("x").isNull().cast("long")).alias("nulls")
            ).collect()[0]
            assert chk["n"] == n and chk["nulls"] == w - 1, dict(chk.asDict())
        if n == 10**7:
            w = 100_000
            got = (df.rolling(w, column="x").sum().spark
                   .select("x").toPandas()["x"].to_numpy(dtype="float64"))
            base = df.spark.select("x").toPandas()["x"].to_numpy(dtype="float64")
            cs = np.concatenate([[0.0], np.cumsum(base)])
            want = cs[w:] - cs[:-w]
            assert np.isnan(got[: w - 1]).all()
            assert np.allclose(got[w - 1:], want, rtol=1e-9, atol=1e-5), \
                float(np.abs(got[w - 1:] - want).max())
            print(f"  exactness: {n - w + 1} windows == numpy cumsum oracle")


def temporal_rolling(spark, ns):
    """r14: wide rolling over a TIMESTAMP column — the temporal branch
    previously always used a sliding frame (O(n·w): the 1e7 × w=100k
    point alone would be 1e12 window updates), now routed through the
    same O(n) growing-frame rewrite as numeric columns at width >= 64,
    with sum/mean numerators exact in decimal(38,0).  t = i8 seconds
    since epoch 2020, so closed forms are exact: mean of the window
    ending at row k is (k - (w-1)/2) seconds; the frame sum telescopes
    to w*k - w(w-1)/2 seconds (in µs, exact — this is also the int64
    overflow regime: w=100k epoch-µs values sum to ~1.6e26)."""
    base_us = 1_577_836_800_000_000  # 2020-01-01 UTC in epoch µs
    w = 100_000
    for n in ns:
        df = _open(spark, n)
        df["t"] = f"astype(i8 * 1000000 + {base_us}, 'datetime64[us]')"
        print(f"-- temporal_rolling N={_tag(n)} w={w}")
        r, _ = _wall("rolling_mean_ts_w100k", lambda:
                     _noop(df.rolling(w, column="t").mean().spark))
        chk = r.agg(
            F.sum(F.col("t").isNull().cast("long")).alias("nulls"),
            F.max("t").alias("mx")).collect()[0]
        assert chk["nulls"] == w - 1, dict(chk.asDict())
        want_mx_us = base_us + ((n - 1) - (w - 1) / 2) * 1_000_000
        got_mx_us = int(chk["mx"].timestamp() * 1e6)
        assert abs(got_mx_us - want_mx_us) <= 1_000_000, (got_mx_us, want_mx_us)
        r2, _ = _wall("rolling_sum_ts_w100k", lambda:
                      _noop(df.rolling(w, column="t").sum().spark))
        chk2 = r2.agg(F.max(F.col("t").cast("decimal(38,0)")).alias("mx"),
                      F.sum(F.col("t").isNull().cast("long")).alias("nulls")
                      ).collect()[0]
        want_sum = w * base_us + sum(range(n - w, n)) * 1_000_000
        assert int(chk2["mx"]) == want_sum, (int(chk2["mx"]), want_sum)
        assert chk2["nulls"] == w - 1


def stringops(spark, ns):
    """strings.py at 1e7: the reference's string-op sweep, each
    materialized with a noop write (its .nop())."""
    import vaex_spark as vs
    df = vs.open(f"{BASE}/strings_{10**7}", spark=spark)
    print("-- stringops N=1e7")
    ops = {
        "capitalize": lambda: df.s.str.capitalize(),
        "cat": lambda: df.s.str.cat(df.s),
        "contains": lambda: df.s.str.contains("9", regex=False),
        "contains_regex": lambda: df.s.str.contains("9", regex=True),
        "count": lambda: df.s.str.count("9"),
        "endswith": lambda: df.s.str.endswith("9"),
        "find": lambda: df.s.str.find("4"),
        "get": lambda: df.s.str.get(1),
        "split_and_join": lambda: df.s.str.split("1").str.join("-"),
        "len": lambda: df.s.str.len(),
        "ljust": lambda: df.s.str.ljust(10),
        "lower": lambda: df.s.str.lower(),
        "lstrip": lambda: df.s.str.lstrip("9"),
        "match": lambda: df.s.str.match("1.*"),
        "pad": lambda: df.s.str.pad(10),
        "repeat": lambda: df.s.str.repeat(2),
        "replace": lambda: df.s.str.replace("123", "321"),
        "upper": lambda: df.s.str.upper(),
        "zfill": lambda: df.s.str.zfill(10),
    }
    for name, make in ops.items():
        def run(make=make):
            e = make()
            d2 = df.copy() if hasattr(df, "copy") else df
            d2["__out"] = e
            d2.nop("__out")
        _wall(name, run)
    # spot invariant: contains('9') count matches the digit-9 closed path
    c9 = df[df.s.str.contains("9", regex=False)].count()
    c9_expect = df.spark.filter(F.col("s").contains("9")).count()
    assert c9 == c9_expect


def export_bench(spark, ns):
    """benchmarks/export.py: export N x M float columns — plain, and
    'correlated' (each output column a SUM of all M inputs, i.e. the
    virtual-column evaluation cost rides the export).  The reference
    exports hdf5; the native store here is parquet.  N = 16M (the
    reference's large point), M in {1, 4, 16}."""
    import shutil

    import vaex_spark as vs
    n = 2**20 * 16
    for m in (1, 4, 16):
        df = vs.DataFrame(spark.range(0, n, 1, 32).select(
            *[(F.col("id") * F.lit(1.0) + F.lit(i)).alias(f"c{i}")
              for i in range(m)]))
        out = f"{BASE}/export_plain_{m}"
        shutil.rmtree(out, ignore_errors=True)
        _wall(f"export_plain N=16M M={m}",
              lambda df=df, out=out: df.export_parquet(out))
        assert spark.read.parquet(out).count() == n
        for i in range(m):
            df[f"t{i}"] = sum(df[f"c{j}"] for j in range(m)) + i
        dfc = df[[f"t{i}" for i in range(m)]]
        outc = f"{BASE}/export_corr_{m}"
        shutil.rmtree(outc, ignore_errors=True)
        _wall(f"export_correlated N=16M M={m}",
              lambda dfc=dfc, outc=outc: dfc.export_parquet(outc))
        back = spark.read.parquet(outc)
        assert back.count() == n and len(back.columns) == m
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(outc, ignore_errors=True)


def partitioned_window(spark, ns):
    """§2.6 partition_by= shift/diff/rolling at the reference N under
    SKEW: derived key where group 0 holds 10% of ALL rows (1e7 at 1e8)
    and 90,000 cold groups hold 1,000 rows each — the r12 verdict's
    task 5 (the probes so far drove only the GLOBAL order path; the
    keyed per-group form is what a 100-TB user should reach for, and
    its skew behavior had no large-N datapoint).

    Invariants are exact closed forms of the construction:
    * shift(1):   nulls == number of non-empty groups (first row each)
    * diff sum:   Σ_groups (max(i8) − min(i8)) — telescoping per group
    * rolling64:  nulls == 63 × number of groups (every group ≥ 64 rows)
    """
    for n in ns:
        df = _open(spark, n)
        print(f"-- partitioned_window N={_tag(n)}")
        # group 0 ← every 10th row (10% hot); else i8 % 100000
        df["skew"] = "where(i8 % 10 == 0, 0, i8 % 100000)"
        n_groups = 1 + sum(1 for k in range(1, 100_000)
                           if k % 10 != 0 and k < n)
        sh, _ = _wall("p_shift_1_skew", lambda:
                      _noop(df.shift(1, column="x", order_key="i8",
                                     partition_by="skew").spark))
        nn = sh.agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("x").isNull().cast("long")).alias("k")).collect()[0]
        assert nn["n"] == n and nn["k"] == n_groups, (dict(nn.asDict()), n_groups)
        d, _ = _wall("p_diff_skew", lambda:
                     _noop(df.diff(column="i8", order_key="i8",
                                   partition_by="skew").spark))
        s = d.agg(F.sum("i8").alias("s")).collect()[0]["s"]
        # group 0: multiples of 10 in [0, n) -> span n - 10
        want = (n - 10)
        for k in range(1, 100_000):
            if k % 10 == 0 or k >= n:
                continue
            cnt = (n - 1 - k) // 100_000 + 1
            want += (cnt - 1) * 100_000
        assert s == want, (s, want)
        w = 64
        r, _ = _wall(f"p_rolling_mean_w{w}_skew", lambda:
                     _noop(df.rolling(w, column="i8", order_key="i8",
                                      partition_by="skew").mean().spark))
        kk = r.agg(F.sum(F.col("i8").isNull().cast("long")).alias("k")).collect()[0]["k"]
        assert kk == (w - 1) * n_groups, (kk, (w - 1) * n_groups)


PROBES = {"stats": stats, "binby_cat": binby_cat, "binby_grid": binby_grid,
          "export_bench": export_bench,
          "groupby_cat": groupby_cat, "h2o": h2o, "sortby": sortby,
          "isin_keys": isin_keys, "filterops": filterops,
          "value_counts": value_counts, "shift_rolling": shift_rolling,
          "partitioned_window": partitioned_window,
          "wide_rolling_tail": wide_rolling_tail,
          "temporal_rolling": temporal_rolling,
          "stringops": stringops}


def main():
    args = sys.argv[1:] or ["all"]
    name = args[0]
    ns = [int(float(a)) for a in args[1:]] or DEFAULT_NS
    spark = _spark()
    if name == "build":
        build(spark, ns)
        return
    for pname in (list(PROBES) if name == "all" else [name]):
        print(f"== {pname}")
        t0 = time.time()
        PROBES[pname](spark, ns)
        print(f"== {pname} done in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
