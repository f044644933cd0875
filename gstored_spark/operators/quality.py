"""Repetition-based quality filtering (the Gopher/MassiveText rule family).

Template-generated and boilerplate web pages are dominated by REPETITION —
the published heuristic filters (Rae et al. 2021, appendix A1.1) threshold
on duplicate-token fractions and most-common-n-gram mass. Two of those
signals, Spark-first:

  - ``dup_word_frac``: 1 - distinct/total tokens, computed INSIDE the row
    with array expressions (split/array_distinct/size) — map-only, no
    shuffle, fused into the scan;
  - ``top_bigram_frac``: mass of the most frequent bigram — needs per-doc
    grouping, so bigrams explode and aggregate by (doc, bigram) then by
    doc: two shuffles both keyed by doc_id, partial-aggregated map-side.

At corpus scale the map-only signal is ~free and filters most junk; the
bigram shuffle touches only documents the cheap signal passed (call it on
the filtered frame). Fractions round to 6 decimals so external engines
reproduce the exact values (driver oracle hash-matches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# documented Gopher-family defaults (A1.1 thresholds are per-signal)
DUP_WORD_MAX = 0.30
TOP_BIGRAM_MAX = 0.18


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, dup_word_frac, top_bigram_frac, repetitive) per doc."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col),
        words.alias("__ws"),
        F.size(words).alias("n_words"),
        F.round(
            1.0 - F.size(F.array_distinct(words)) / F.size(words), 6
        ).alias("dup_word_frac"),
    )
    # explode_OUTER: a document with fewer than two tokens has no bigrams
    # but must still get a row (top_bigram_frac = 0.0) — with inner explode
    # it would vanish from the output and could never be flagged or joined.
    bigrams = base.select(
        id_col,
        "n_words",
        "dup_word_frac",
        F.explode_outer(
            F.zip_with(
                F.expr("slice(__ws, 1, size(__ws) - 1)"),
                F.expr("slice(__ws, 2, size(__ws) - 1)"),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    per_bigram = bigrams.groupBy(id_col, "n_words", "dup_word_frac", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    real = F.when(F.col("bigram").isNotNull(), F.col("c"))
    per_doc = per_bigram.groupBy(id_col, "n_words", "dup_word_frac").agg(
        F.coalesce(
            F.round(F.max(real) / F.sum(real), 6), F.lit(0.0)
        ).alias("top_bigram_frac")
    )
    return per_doc.withColumn(
        "repetitive",
        (F.col("dup_word_frac") > DUP_WORD_MAX)
        | (F.col("top_bigram_frac") > TOP_BIGRAM_MAX),
    )
