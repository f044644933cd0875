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
    from gstored_spark.partitioning import spread_scan

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = spread_scan(df.select(F.col(id_col), F.col(text_col)), barrier=True).select(
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


def corpus_frequency_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max: int = 100,
) -> DataFrame:
    """CCNet-style corpus-frequency document scoring (Wenzek et al. 2020).

    CCNet ranks Common-Crawl documents by language-model perplexity; the
    engine-side analog that needs no external model is scoring a document
    by how COMMON its tokens are in the corpus itself — boilerplate and
    generated junk skew toward tokens the corpus has never seen (typos,
    hashes, markup fragments), and that signal is a pure two-aggregate
    DataFrame plan:

      pass 1: token -> corpus occurrence count (explode + groupBy token,
              partial-aggregated map-side; the result is VOCABULARY-sized,
              orders of magnitude smaller than the corpus);
      pass 2: probe each document's token stream against that table and
              aggregate per document.

    Returns (id_col, n_tokens, mean_tok_freq, rare_frac, unfamiliar):
      mean_tok_freq  average corpus count of the document's tokens,
      rare_frac      fraction of tokens with corpus count <= rare_max,
      unfamiliar     rare_frac > 0.5 — mostly-rare documents.

    Every reported number is an integer sum or a single division of two
    integers (no floating-point accumulation), so the values are
    order-independent and reproduce bit-for-bit in external engines —
    the driver oracle hash-matches against DuckDB.

    Shuffle shape (guide §2.3 "aggregate before you shuffle"): the token
    stream is reduced to per-document DISTINCT (id, tok, cnt) rows first —
    one map-side-combined shuffle — and that pre-aggregate (materialized
    once, so the corpus explode runs exactly once) feeds BOTH the vocab
    count (sum of cnt) and the probe join. On natural text distinct
    per-doc tokens are a small fraction of occurrences, so the join input
    and the vocab shuffle shrink by the same factor; occurrence-weighted
    sums (n_tokens = Σcnt, Σ freq·cnt, Σ cnt where rare) are integer-exact
    equal to the per-occurrence originals. At 100 TB the vocab join is
    broadcast-or-shuffle by AQE's live size estimate.
    """
    from pyspark.storagelevel import StorageLevel

    from gstored_spark.partitioning import spread_scan

    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(ws).alias("tok")
    )
    tok_counts = (
        toks.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    vocab = tok_counts.groupBy("tok").agg(F.sum("cnt").alias("freq"))
    per_doc = (
        tok_counts.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("freq") * F.col("cnt")).alias("__sum_freq"),
            F.sum(
                F.when(F.col("freq") <= rare_max, F.col("cnt")).otherwise(F.lit(0))
            ).alias("__n_rare"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(F.col("__sum_freq") / F.col("n_tokens"), 6).alias("mean_tok_freq"),
        F.round(F.col("__n_rare") / F.col("n_tokens"), 6).alias("rare_frac"),
        (F.col("__n_rare") / F.col("n_tokens") > 0.5).alias("unfamiliar"),
    )
