"""Similarity search over an embedding column (array<float>).

Three paths:
  - topk_cosine: brute-force top-k, pure DataFrame (F.aggregate/zip_with dot
    products in double) — the correctness baseline, DuckDB-oracle-able.
  - topk_cosine_partitioned: the scale path for "few queries x huge corpus":
    broadcast the query matrix, numpy matmul per Arrow batch via
    mapInPandas, partial top-k per partition, global top-k by groupBy —
    shuffle volume is partitions*k rows, never the corpus.
  - srp_buckets / topk_cosine_srp: sign-random-projection LSH variant —
    deterministic +-1 hyperplanes derived from md5 bits, candidates probe
    only their bucket (multi-probe on Hamming-1 neighbors), then exact
    re-rank. The 100 TB answer when queries are also many.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _norm(vec) -> "F.Column":
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def cosine(a, b) -> "F.Column":
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm(a) * _norm(b))


def topk_cosine(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Brute force: queries x corpus -> (qid, nid, rank). Deterministic
    tie-break on (score desc, nid asc); self-matches excluded. The query
    side is broadcast (it is the small side by construction)."""
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("nid"))
    scored = scored.withColumn("score", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


def topk_cosine_partitioned(
    corpus: DataFrame, queries_pdf: pd.DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Scale path: numpy matmul per partition against the broadcast query
    matrix; emits k rows per (partition, query), then a global top-k."""
    from pyspark.sql.window import Window

    qids = queries_pdf[id_col].to_numpy()
    qmat = np.stack(queries_pdf[vec_col].to_list()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_list()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
            # round BEFORE selection so partial top-k ranks exactly like
            # topk_cosine's rounded scores; select per-partition candidates
            # with the SAME (score desc, nid asc) tie-break as the global
            # window, and take k+1 so dropping a self-match still leaves k
            scores = np.round(qmat @ mat.T, 6)  # (Q, B)
            top = min(k + 1, scores.shape[1])
            rows = []
            for qi in range(len(qids)):
                order = np.lexsort((nids, -scores[qi]))[:top]
                for j in order:
                    if nids[j] != qids[qi]:
                        rows.append((int(qids[qi]), int(nids[j]), float(scores[qi, j])))
            yield pd.DataFrame(rows, columns=["qid", "nid", "score"])

    partial = corpus.select(id_col, vec_col).mapInPandas(
        part, schema="qid long, nid long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )


# ---- sign-random-projection LSH --------------------------------------------


def _srp_sign(vec, plane: int, dim: int) -> "F.Column":
    """Sign of <vec, h_plane> where h_plane[d] = +-1 from bit parity of
    md5('srp|plane|d') — deterministic, seedless, identical everywhere."""
    import hashlib

    signs = [
        1 if int(hashlib.md5(f"srp|{plane}|{d}".encode()).hexdigest()[:2], 16) & 1 else -1
        for d in range(dim)
    ]
    arr = F.array(*[F.lit(float(s)) for s in signs])
    dot = F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (dot >= 0).cast("int")


def srp_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, planes: int = 8
) -> DataFrame:
    """-> (id, bucket int): LSH bucket = concatenated SRP sign bits."""
    bucket = F.lit(0)
    for p in range(planes):
        bucket = F.shiftleft(bucket, 1) + _srp_sign(F.col(vec_col), p, dim)
    return df.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def topk_cosine_srp(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    dim: int, k: int = 5, planes: int = 8, multiprobe: bool = True,
) -> DataFrame:
    """ANN: candidates share the query's SRP bucket (plus Hamming-1 buckets
    when multiprobe), exact cosine re-rank inside the candidate set."""
    from pyspark.sql.window import Window

    cb = srp_buckets(corpus, id_col, vec_col, dim, planes).withColumnRenamed(
        "bucket", "cbucket"
    )
    qb = srp_buckets(queries, id_col, vec_col, dim, planes)
    if multiprobe:
        powers = F.array(*[F.lit(1 << b) for b in range(planes)])
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(
                F.sequence(F.lit(1), F.lit(planes)),
                lambda i: F.col("bucket").bitwiseXOR(F.element_at(powers, i)),
            ),
        )
        qb = qb.select(id_col, F.explode(probes).alias("cbucket"))
    else:
        qb = qb.withColumnRenamed("bucket", "cbucket")
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    cand = (
        qb.withColumnRenamed(id_col, "qid")
        .join(cb.withColumnRenamed(id_col, "nid"), "cbucket")
        .select("qid", "nid")
        .distinct()
        .filter(F.col("qid") != F.col("nid"))
    )
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "nid")
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )
