"""r14 optimization round: the hot literal/HOF expression sites are
assembled as parsed SQL text (one py4j round-trip) instead of Column
calls (1-2 ms per round-trip, ~10 ms per HOF lambda on this driver).
These tests pin that every SQL-text twin is VALUE-IDENTICAL to the
Column form it replaced, including the degenerate inputs (NaN/inf
coordinates, NULL text) where a naive string format would diverge."""

import math

import pytest
from pyspark.sql import functions as F


def test_lit_vec_roundtrips_special_floats(spark):
    from vaex_spark.datapipe.similarity import _lit_vec
    vals = [0.1, -0.0, 1e-300, 1.7976931348623157e308, float("nan"),
            float("inf"), float("-inf"), 2.5000000000000004]
    out = spark.range(1).select(_lit_vec(vals).alias("v")).collect()[0]["v"]
    for a, b in zip(vals, out):
        if math.isnan(a):
            assert math.isnan(b)
        else:
            assert a == b and math.copysign(1, a) == math.copysign(1, b)


def test_hyperplane_bucket_sql_matches_column(spark):
    """str-input (SQL text, dot let-bound once) == Column input
    (dot inlined twice) on real embeddings AND on planted degenerate
    vectors (NaN coordinate, zeros)."""
    from vaex_spark.datapipe.similarity import _hyperplanes, hyperplane_bucket
    planes = _hyperplanes(4, 5, seed=7)
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 2.0, 1.0]), (2, [0.0, 0.0, 0.0, 0.0]),
         (3, [float("nan"), 1.0, 1.0, 1.0]), (4, [-1.0, -2.0, -3.0, 4.0])],
        "id bigint, embedding array<double>")
    a = df.select("id", hyperplane_bucket(F.col("embedding"),
                                          planes).alias("b")).collect()
    b = df.select("id", hyperplane_bucket("embedding",
                                          planes).alias("b")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_assign_sql_matches_column(spark):
    import numpy as np
    from vaex_spark.datapipe.similarity import ivf_assign
    rng = np.random.RandomState(3)
    cent = rng.randn(5, 4)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    a = df.select("id", ivf_assign(F.col("embedding"), cent).alias("c")).collect()
    b = df.select("id", ivf_assign("embedding", cent).alias("c")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_assign_cluster_sql_matches_column(spark):
    import numpy as np
    from vaex_spark.datapipe.similarity import assign_cluster
    rng = np.random.RandomState(4)
    cent = rng.randn(6, 4)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    a = df.select("id", assign_cluster(F.col("embedding"), cent,
                                       round_to=6).alias("c")).collect()
    b = df.select("id", assign_cluster("embedding", cent,
                                       round_to=6).alias("c")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_gram_hashes_null_doc_emits_no_rows(spark):
    """The r14 array-form gram hasher must keep the zip form's NULL
    contract: a NULL text contributes ZERO gram rows (the unguarded
    array form would manufacture one phantom xxhash64('') gram), and
    values equal xxhash64 over shingles() for normal docs."""
    from vaex_spark.datapipe.dedup import _gram_hashes, shingles
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, None), (3, ""), (4, "one two"),
         (5, "x y z w v u t s r q")],
        "doc_id bigint, text string")
    got = sorted(map(tuple, _gram_hashes(df, "doc_id", "text", 5).collect()))
    want = sorted(map(tuple, df.select(
        "doc_id", F.explode(shingles(F.col("text"), k=5)).alias("g"))
        .select("doc_id", F.xxhash64("g").alias("__h")).collect()))
    assert got == want
    assert not any(i == 2 for i, _ in got)


def test_cos_sql_matches_cosine_column(spark):
    from vaex_spark.datapipe.similarity import _cos_sql, cosine
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], [3.0, 2.0, 1.0]),
         (2, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),     # zero norm -> null
         (3, [float("nan"), 1.0, 1.0], [1.0, 1.0, 1.0])],
        "id bigint, a array<double>, b array<double>")
    col = df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()
    sql = df.select("id", F.expr(_cos_sql("a", "b")).alias("c")).collect()
    for x, y in zip(sorted(col), sorted(sql)):
        assert x["id"] == y["id"]
        if x["c"] is None or (x["c"] != x["c"]):
            assert y["c"] is None or (y["c"] != y["c"])
        else:
            assert x["c"] == y["c"]


@pytest.fixture(scope="module")
def _edge_docs(spark):
    return spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again"),
         (1, "short doc"), (2, None), (3, ""), (4, "  Spaced   out\tTABS\nhere  "),
         (5, "a b c d e"), (6, "one"), (7, "x " * 200)],
        "doc_id long, text string")


@pytest.mark.parametrize("k", [1, 2, 5, 8])
def test_shingles_sql_matches_column(spark, _edge_docs, k):
    """shingles(name) (one parsed SQL string) == shingles(Column) on
    NULL / empty / short / whitespace-heavy / long docs."""
    from vaex_spark.datapipe.text import shingles
    a = _edge_docs.select("doc_id", shingles(F.col("text"), k=k).alias("s"))
    b = _edge_docs.select("doc_id", shingles("text", k=k).alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.mark.parametrize("n", [1, 2, 5, 8])
def test_word_ngrams_forms_match_r14_semantics(spark, _edge_docs, n):
    """word_ngrams' r15 rewrite (let-bound try_element_at grams; SQL
    twin for string names) against the pre-r15 reference expression
    (per-gram array_join(slice(...))) — values identical on NULL /
    empty / short / whitespace-heavy / long docs, including the
    empty-array n<size contract that distinguishes it from shingles."""
    from vaex_spark.datapipe.repetition import word_ngrams
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                            r"\s+", " ")), " ")
    size = F.size(words)
    old = F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), size - n),
                    lambda i: F.array_join(F.slice(words, i + 1, n), " ")))
    ref = _edge_docs.select("doc_id", old.alias("g"))
    col_form = _edge_docs.select("doc_id",
                                 word_ngrams(F.col("text"), n).alias("g"))
    sql_form = _edge_docs.select("doc_id", word_ngrams("text", n).alias("g"))
    for got in (col_form, sql_form):
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


@pytest.mark.parametrize("num_perm,num_bands", [(64, 32), (16, 8), (8, 8)])
def test_minhash_sql_twins_match_column(spark, _edge_docs, num_perm, num_bands):
    """The one-parse signature and band-table SQL twins (the
    _banded_auto column-branch fast path) == the Column builders —
    same base hashes, permutation family, band seeds, NULL contract."""
    from vaex_spark.datapipe.text import _shingles_sql
    from vaex_spark.datapipe.dedup import (
        minhash_signature, minhash_bands_col,
        _minhash_signature_sql, _minhash_bands_sql)
    rpb = num_perm // num_bands
    col_sig = minhash_signature(F.col("text"), num_perm=num_perm, shingle_k=5)
    a = _edge_docs.select(
        "doc_id", minhash_bands_col(col_sig, num_bands, rpb).alias("b"))
    b = _edge_docs.select("doc_id", F.expr(_minhash_bands_sql(
        _minhash_signature_sql(_shingles_sql("text", 5), num_perm),
        num_bands, rpb)).alias("b"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = _edge_docs.select("doc_id", minhash_signature(
        "text", num_perm=num_perm, shingle_k=5).alias("s"))
    d = _edge_docs.select("doc_id", col_sig.alias("s"))
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
