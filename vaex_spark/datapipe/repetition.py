"""Repetition-based quality signals for training-data curation.

The signal set follows the public Gopher/MassiveText filtering rules
(Rae et al. 2021, "Scaling Language Models", appendix A1.1): documents
dominated by duplicated lines or repeated n-grams are low-quality for
LM training.  Definitions used here (deterministic, engine-independent,
so a DuckDB oracle can replay them):

* ``dup_line_frac``       — (n_lines - n_distinct_lines) / n_lines
* ``dup_line_char_frac``  — characters in repeat occurrences of
  duplicated lines (count-1 per line) / total line characters
* ``top_ngram_char_frac`` — occurrences(top gram) * len(top gram) /
  total normalized text length; the top gram is max by (count, gram)
  so ties break deterministically
* ``dup_ngram_char_frac`` — sum over grams seen >1 time of
  count*len(gram), over the summed char length of ALL gram occurrences

100 TB plan: every signal is explode -> groupBy(doc_id[, gram]) ->
groupBy(doc_id) — two hash-partial-aggregated shuffles keyed by doc,
no driver materialization, no UDFs.  Rows stay (id, gram) pairs; text
bodies never shuffle (Catalyst prunes them out of the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["word_ngrams", "repetition_stats", "gopher_filter"]


def _norm_words(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def word_ngrams(text, n: int = 2) -> Column:
    """Array of space-joined word n-grams of the normalized text
    (empty array when the document has fewer than n words)."""
    words = _norm_words(text if isinstance(text, Column) else F.col(text))
    size = F.size(words)
    idx = F.sequence(F.lit(0), size - n)
    return F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")))


def _gram_stats(sdf, id_col: str, gram_col: Column, out_top: str, out_dup: str):
    """Shared explode->count->ratio pipeline for one n-gram size."""
    g = (sdf.select(F.col(id_col), F.explode(gram_col).alias("_g"))
         .groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_cnt")))
    glen = F.length(F.col("_g"))
    per_doc = g.groupBy(id_col).agg(
        # max_by on a struct -> deterministic (count first, then gram text)
        F.max(F.struct(F.col("_cnt"), F.col("_g"))).alias("_top"),
        F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt") * glen).otherwise(0)).alias("_dupchars"),
        F.sum(F.col("_cnt") * glen).alias("_allchars"))
    return per_doc.select(
        F.col(id_col),
        (F.col("_top._cnt") * F.length(F.col("_top._g")) /
         F.col("_allchars")).alias(out_top),
        (F.col("_dupchars") / F.col("_allchars")).alias(out_dup))


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id",
                     top_n: int = 2, dup_n: int = 5):
    """Per-document repetition signals.

    Returns (id, n_lines, dup_line_frac, dup_line_char_frac,
    top{top_n}gram_char_frac, dup{dup_n}gram_char_frac) — one row per
    INPUT document (r9): docs with no non-empty lines (null/empty/
    whitespace text) keep a row with ``n_lines`` 0 and null fracs
    instead of silently vanishing from the stats (and therefore from
    :func:`gopher_filter`, which judges repetition, not emptiness —
    compose a length/quality filter for that).
    """
    from ..dataframe import DataFrame
    wrapped = isinstance(df, DataFrame)
    sdf = df._spark_df() if wrapped else df
    t = F.col(text_col)

    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    line_counts = (sdf.select(F.col(id_col), F.explode(lines).alias("_l"))
                   .groupBy(id_col, "_l").agg(F.count(F.lit(1)).alias("_cnt")))
    llen = F.length(F.col("_l"))
    line_stats = line_counts.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_lines"),
        ((F.sum("_cnt") - F.count(F.lit(1))) / F.sum("_cnt")).alias("dup_line_frac"),
        (F.sum(F.when(F.col("_cnt") > 1, (F.col("_cnt") - 1) * llen).otherwise(0)) /
         F.sum(F.col("_cnt") * llen)).alias("dup_line_char_frac"))

    top_name = f"top{top_n}gram_char_frac"
    dup_name = f"dup{dup_n}gram_char_frac"
    tops = _gram_stats(sdf, id_col, word_ngrams(t, top_n), top_name, "_ignore_dup")
    dups = _gram_stats(sdf, id_col, word_ngrams(t, dup_n), "_ignore_top", dup_name)

    out = (sdf.select(F.col(id_col))
           .join(line_stats, on=id_col, how="left")
           .withColumn("n_lines",
                       F.coalesce(F.col("n_lines"), F.lit(0).cast("long")))
           .join(tops.select(id_col, top_name), on=id_col, how="left")
           .join(dups.select(id_col, dup_name), on=id_col, how="left"))
    return DataFrame(out) if wrapped else out


def gopher_filter(df, text_col: str = "text", id_col: str = "doc_id",
                  max_dup_line_frac: float = 0.30,
                  max_dup_line_char_frac: float = 0.20,
                  max_top2gram_char_frac: float = 0.20,
                  max_dup5gram_char_frac: float = 0.15):
    """Keep documents passing the Gopher repetition thresholds
    (defaults from the published rule set).  Returns the surviving rows
    of ``df`` (broadcast-free semi-join on the id)."""
    from ..dataframe import DataFrame
    wrapped = isinstance(df, DataFrame)
    sdf = df._spark_df() if wrapped else df
    stats = repetition_stats(sdf, text_col=text_col, id_col=id_col)
    keep = stats.filter(
        (F.coalesce(F.col("dup_line_frac"), F.lit(0.0)) <= max_dup_line_frac)
        & (F.coalesce(F.col("dup_line_char_frac"), F.lit(0.0)) <= max_dup_line_char_frac)
        & (F.coalesce(F.col("top2gram_char_frac"), F.lit(0.0)) <= max_top2gram_char_frac)
        & (F.coalesce(F.col("dup5gram_char_frac"), F.lit(0.0)) <= max_dup5gram_char_frac)
    ).select(id_col)
    out = sdf.join(keep, on=id_col, how="left_semi")
    return DataFrame(out) if wrapped else out
