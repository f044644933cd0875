"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard published procedure (GPT-3 appendix C, Brown et al. 2020;
C4 benchmark-overlap analysis, Dodge et al. EMNLP 2021) removes from the
training corpus any document containing an exact n-gram (n = 8..13 words)
that also occurs in an evaluation set — otherwise test answers leak into
training data and benchmark numbers are meaningless.

Spark-first shape, designed for the 100 TB asymmetry of the problem:
the EVAL side is tiny (benchmark suites are at most a few hundred MB of
text) while the corpus side is the full crawl. So:

  - eval n-grams are computed once, deduplicated, and **broadcast** —
    the corpus-side probe is a map-side hash join, no shuffle of the
    corpus stream;
  - corpus documents generate their distinct n-grams inside the row
    (split / transform / array_distinct — whole-stage codegen, no Python),
    then explode only for the probe;
  - the only corpus-keyed shuffle is the final per-document aggregate,
    partial-aggregated map-side.

All reported columns are integers or single-division ratios of integers,
so external engines reproduce the exact values (the driver oracle
hash-matches against DuckDB).

This operator has no gStoreD counterpart (the reference is a graph store,
not a corpus pipeline); it extends the engine along the training-data
axis like operators/dedup.py and operators/quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# published decontamination window is 8-13 words (GPT-3 used 13 for
# streams, 8 for Q&A); callers tune n to their benchmark granularity
DEFAULT_N = 8


def _distinct_ngrams(text_col: str, n: int) -> F.Column:
    """Distinct word n-grams of a text column as an array, row-local.

    Tokenization matches operators/quality.py / textstats.py exactly
    (lower, trim, split on whitespace runs) so decontamination keys agree
    with the rest of the text pipeline. A sequence() guard keeps documents
    shorter than n words at an EMPTY array — Spark's sequence(1, 0) would
    yield the descending [1, 0], not [].
    """
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = DEFAULT_N
) -> DataFrame:
    """Distinct n-grams of the evaluation set: one `gram` column."""
    return (
        eval_df.select(F.explode(_distinct_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-document contamination report against an evaluation set.

    Returns (id_col, n_grams, n_hits, contamination, contaminated):
      n_grams        distinct word n-grams in the document,
      n_hits         how many of those occur anywhere in the eval set,
      contamination  n_hits / n_grams (0.0 for documents shorter than n),
      contaminated   n_hits > 0 — the published drop criterion.

    The eval n-gram set is explicitly broadcast: benchmark suites are
    small by construction, and a broadcast probe keeps the corpus stream
    shuffle-free until the per-document aggregate. Filter the corpus with
    ``~contaminated`` to apply the GPT-3 rule.
    """
    from gstored_spark.partitioning import spread_scan

    base = spread_scan(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode_outer(_distinct_ngrams(text_col, n)).alias("gram"),
    )
    evalg = F.broadcast(
        eval_ngram_set(spread_scan(eval_df), text_col, n).withColumn("__hit", F.lit(1))
    )
    agg = base.join(evalg, "gram", "left").groupBy(id_col).agg(
        # count() skips nulls: the explode_outer placeholder row keeps
        # gram-less documents present with n_grams = 0
        F.count("gram").alias("n_grams"),
        F.count("__hit").alias("n_hits"),
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_hits",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )
