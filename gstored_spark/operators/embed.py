"""Text -> embedding: deterministic hashing-trick bag-of-tokens vectors.

The feature-hashing construction (Weinberger et al., ICML'09 — public):
each token hashes to a bucket in [0, dim) with a +-1 sign from an
independent hash bit; the document vector is the l2-normalized signed
bucket-count histogram. Entirely md5-based so a DuckDB oracle reproduces it
bit-for-bit (same digests, same arithmetic), and entirely JVM-side (explode
+ groupBy, no Python).

Output is the EXPLODED sparse form (id, i, val) — scalar columns that the
correctness harness can canonicalize — plus a dense-assembly helper for
feeding operators/similarity.py (array<float> column).

At 100 TB: map + one groupBy per (doc, bucket) with map-side partial sums,
then a per-doc norm join — no all-pairs anything; dim bounds the shuffle
width per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.operators.dedup import tokens


def _hex_val(h, pos: int) -> "F.Column":
    """Value 0-15 of hex digit ``pos`` (1-based) of md5 digest ``h`` —
    arithmetic portable to the DuckDB oracle (strpos trick)."""
    return F.conv(F.substring(h, pos, 1), 16, 10).cast("int")


def text_embedding_sparse(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """-> (id, i, val): l2-normalized signed bucket counts, val rounded to
    6 decimals, zero buckets omitted."""
    from gstored_spark.partitioning import spread_scan

    toks = (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", F.md5("tok"))
    )
    bucket = (
        (((_hex_val(F.col("h"), 1) * 16 + _hex_val(F.col("h"), 2)) * 16
          + _hex_val(F.col("h"), 3)) * 16 + _hex_val(F.col("h"), 4)) % dim
    )
    sign = F.when(_hex_val(F.col("h"), 5) % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    raw = toks.select(F.col(id_col), bucket.alias("i"), sign.alias("s")).groupBy(
        id_col, "i"
    ).agg(F.sum("s").cast("double").alias("v")).filter(F.col("v") != 0)
    norms = raw.groupBy(id_col).agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    return raw.join(norms, id_col).select(
        id_col, "i", F.round(F.col("v") / F.col("nrm"), 6).alias("val")
    )


def text_embedding(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """-> (id, embedding array<double>[dim]): dense assembly of the sparse
    form, ready for operators/similarity.py (topk_cosine & friends)."""
    sparse = text_embedding_sparse(df, id_col, text_col, dim)
    assembled = sparse.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("i", "val"))).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return assembled.select(
        id_col,
        F.transform(idx, lambda i: F.coalesce(F.col("m")[i], F.lit(0.0))).alias(
            "embedding"
        ),
    )
