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
    tie-break on (score desc, nid asc); self-matches excluded; score =
    round(dot / (|q| * |n|), 6) in double. The query side is collected and
    broadcast (it is the small side by construction — it was broadcast
    before as a join side).

    Execution shape: each Arrow batch of corpus rows scores against the
    broadcast query matrix with ONE float64 numpy matmul and emits only
    its per-batch top-k rows per query; a global row_number window
    finishes the exact ranking over partitions*k*|Q| candidate rows.
    (This replaced a BroadcastNestedLoopJoin whose per-pair score was
    interpreted aggregate/zip_with higher-order expressions — recomputing
    BOTH vector norms for every pair — running in a single task because
    the corpus parquet is one input split.)"""
    from pyspark.sql.window import Window

    spark = corpus.sparkSession
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    rows = q.collect()
    qids = np.array([r["qid"] for r in rows])
    qmat = np.array([r["qv"] for r in rows], dtype=np.float64)
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    bc = spark.sparkContext.broadcast((qids, qmat, qn))

    from gstored_spark.partitioning import spread_scan

    side = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    # spread the matmul: a single parquet file would otherwise score the
    # whole corpus in one task (no-op when the scan has enough splits)
    side = spread_scan(side)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bqmat, bqn = bc.value
        if len(bqids) == 0:
            return
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nid = pdf["nid"].to_numpy()
            nv = np.array(pdf["nv"].tolist(), dtype=np.float64)
            nn = np.sqrt((nv * nv).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.round((bqmat @ nv.T) / (bqn[:, None] * nn[None, :]), 6)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(bqids)):
                # same (score desc, nid asc) order as the global window, so
                # the per-batch cut keeps every global-top-k candidate
                order = np.lexsort((nid, -scores[qi]))
                sel = order[nid[order] != bqids[qi]][:k]
                out_q.append(np.full(len(sel), bqids[qi]))
                out_n.append(nid[sel])
                out_s.append(scores[qi, sel])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "nid": np.concatenate(out_n),
                    "score": np.concatenate(out_s),
                }
            )

    id_dt = side.schema["nid"].dataType.simpleString()
    scored = side.mapInPandas(gen, schema=f"qid {id_dt}, nid {id_dt}, score double")
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


# driver-collect ceiling for the exact-pairs baseline (mirrors
# cc.SMALL_GRAPH_EDGES): ~1M x 128-dim float64 ≈ 1 GB — beyond that the
# caller wants cosine_near_dup, not a bigger driver
EXACT_PAIRS_MAX_ROWS = 1_000_000


def cosine_pairs_exact(
    df: DataFrame, id_col: str, vec_col: str, tau: float
) -> DataFrame:
    """All pairs (a < b) with cosine similarity >= tau — the EXACT
    embedding-near-duplicate edge set. Quadratic by design: this is the
    correctness baseline the bucketed path (cosine_near_dup) is verified
    against, same division of labor as topk_cosine vs topk_cosine_srp.

    Execution shape: the full (id, vector) matrix is broadcast — the
    baseline's one-side-fits-in-memory contract, same as
    topk_cosine_partitioned's query matrix — and each Arrow batch of rows
    computes a float64 numpy matmul block against it, emitting only the
    (a < b, score >= tau) survivors. The O(n^2) work stays vectorized and
    distributed across partitions; nothing quadratic is ever shuffled.
    (This replaced an F.aggregate/zip_with per-pair score: interpreted
    higher-order functions evaluated 3 aggregate passes x vector length
    for every one of the n^2/2 joined pairs.) Scores rounded to 6 decimals
    so the threshold compare is stable across engines. -> (a, b, score)."""
    spark = df.sparkSession
    side = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    n = side.count()
    if n > EXACT_PAIRS_MAX_ROWS:
        raise ValueError(
            f"cosine_pairs_exact collects the full (id, vector) matrix to "
            f"the driver; {n} rows > limit {EXACT_PAIRS_MAX_ROWS}. This is "
            f"the verification BASELINE — use cosine_near_dup (SRP-bucketed)"
            f" for corpus-scale inputs."
        )
    rows = side.collect()
    ids_all = np.array([r["a"] for r in rows])  # dtype follows the id type
    mat = np.array([r["va"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids_all, mat, norms))
    # spread the O(n^2) matmul: a single parquet file would otherwise put
    # the entire block-matmul in one task (the pair set is independent of
    # the physical partitioning; no-op when the scan has enough splits)
    from gstored_spark.partitioning import spread_scan

    side = spread_scan(side)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bids, bmat, bnorms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            aid = pdf["a"].to_numpy()
            av = np.array(pdf["va"].tolist(), dtype=np.float64)
            an = np.sqrt((av * av).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.round(
                    (av @ bmat.T) / (an[:, None] * bnorms[None, :]), 6
                )
            keep = (scores >= tau) & (aid[:, None] < bids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"a": aid[ai], "b": bids[bj], "score": scores[ai, bj]}
            )

    id_dt = side.schema["a"].dataType.simpleString()
    return side.mapInPandas(gen, schema=f"a {id_dt}, b {id_dt}, score double")


def cosine_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    tau: float,
    planes: int = 8,
    multiprobe: bool = True,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERS, bucketed — the scale path
    (never all-pairs): SRP-LSH buckets generate candidate pairs (one side
    additionally probes every Hamming-1 bucket when ``multiprobe``, the
    same probe schedule as topk_cosine_srp), exact cosine verifies each
    candidate (precision 1 vs cosine_pairs_exact by construction; recall
    is the SRP collision probability (1 - theta/pi)^planes boosted by the
    probes), connected components clusters the surviving edge set, and the
    representative is the component minimum — deterministic at any
    parallelism. Buckets larger than ``max_bucket`` are dropped, the same
    skew guard as lsh_candidate_pairs. -> (id_col, rep)."""
    from gstored_spark.operators.cc import components_with_singletons

    b = srp_buckets(df, id_col, vec_col, dim, planes)
    left = b.select(F.col(id_col).alias("a"), "bucket")
    if multiprobe:
        powers = F.array(*[F.lit(1 << p) for p in range(planes)])
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(
                F.sequence(F.lit(1), F.lit(planes)),
                lambda i: F.col("bucket").bitwiseXOR(F.element_at(powers, i)),
            ),
        )
        left = b.select(
            F.col(id_col).alias("a"), F.explode(probes).alias("bucket")
        )
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz"))
    right = (
        b.join(counts, "bucket")
        .filter(F.col("bsz") <= max_bucket)
        .select(F.col(id_col).alias("b"), "bucket")
    )
    cand = (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    edges = (
        cand.join(va, "a")
        .join(vb, "b")
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= tau)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp = components_with_singletons(
        edges, df.select(F.col(id_col).alias("vertex"))
    )
    return comp.select(
        F.col("vertex").alias(id_col), F.col("component").alias("rep")
    )
