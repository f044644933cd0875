"""ANN similarity vs numpy brute force; text-stat operators vs pure python."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gstored_spark.operators import similarity as SIM
from gstored_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").persist()


def _numpy_topk(pdf, qids, k=5):
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = matn[list(ids).index(q)]
        scores = np.round(matn @ qv, 6)
        order = sorted(
            [(float(-scores[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q]
        )
        out[q] = [nid for _, nid in order[:k]]
    return out


def test_topk_cosine_matches_numpy(spark, emb):
    qids = [0, 7, 13]
    queries = emb.filter(F.col("vec_id").isin(qids))
    got_rows = SIM.topk_cosine(emb, queries, "vec_id", "embedding", k=5).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["nid"])
    want = _numpy_topk(emb.toPandas(), qids, k=5)
    assert got == want


def test_topk_partitioned_matches_dataframe(spark, emb):
    qids = [0, 7, 13]
    queries = emb.filter(F.col("vec_id").isin(qids))
    a = {(r["qid"], r["rank"]): r["nid"] for r in
         SIM.topk_cosine(emb, queries, "vec_id", "embedding", k=5).collect()}
    b = {(r["qid"], r["rank"]): r["nid"] for r in
         SIM.topk_cosine_partitioned(
             emb.repartition(7), queries.toPandas(), "vec_id", "embedding", k=5
         ).collect()}
    assert a == b


def test_srp_ann_recall(spark, emb):
    qids = [0, 7, 13, 21, 42]
    queries = emb.filter(F.col("vec_id").isin(qids))
    exact = SIM.topk_cosine(emb, queries, "vec_id", "embedding", k=5)
    # synthetic embeddings are near-uniform random (no cluster structure),
    # the hardest case for LSH — 3 planes + multiprobe is the operating
    # point that still beats the random-candidate baseline by ~2x here
    ann = SIM.topk_cosine_srp(emb, queries, "vec_id", "embedding", dim=64, k=5, planes=3)
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    a = {(r["qid"], r["nid"]) for r in ann.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"SRP recall too low: {recall}"


def test_quality_and_tokens_pure_python_parity(spark):
    texts = [
        (1, "The quick brown fox, with the lazy dog!"),
        (2, "word " * 50),
        (3, "x"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    q = {r["doc_id"]: r for r in TS.quality_score(df, "doc_id", "text").collect()}
    for did, text in texts:
        norm = " ".join(text.lower().split())
        toks = norm.split(" ")
        assert q[did]["n_chars"] == len(norm)
        assert q[did]["n_tokens"] == len(toks)
        stop = sum(1 for t in toks if t in TS.LANG_MARKERS["en"])
        assert q[did]["stopword_ratio"] == round(stop / len(toks), 6)
    t = {r["doc_id"]: r for r in TS.token_counts(df, "doc_id", "text").collect()}
    assert t[1]["ws_tokens"] == 8
    # "quick" -> 2 subwords, "fox," -> 1 + 1 punct
    assert t[3]["bpe_tokens"] == 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "und der die das mit von"),
         (3, "zzz qqq www")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in TS.lang_id(df, "doc_id", "text").collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_winnow_matches_pure_python(spark):
    texts = [(1, "the quick brown fox jumps over the lazy dog " * 4),
             (2, "tiny"), (3, None)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["doc_id"]: r["winnow_fp"] for r in TS.winnowed(df, "doc_id", "text").collect()}
    assert got[1] == TS.winnow_fingerprint(texts[0][1])
    assert got[2] == []
    assert got[3] == []
    # shifted text shares most fingerprints (the winnowing guarantee)
    shifted = "PREFIX " + texts[0][1]
    common = set(got[1]) & set(TS.winnow_fingerprint(shifted))
    assert len(common) / len(set(got[1])) > 0.8


def test_text_embedding_feeds_ann(spark):
    """End-to-end: documents -> hashing-trick embeddings -> brute-force
    cosine top-k. Dense assembly must match the sparse form and unit-norm."""
    from gstored_spark.operators.embed import text_embedding, text_embedding_sparse

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    dense = text_embedding(docs, "doc_id", "text", dim=32).persist()
    rows = dense.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    for r in rows[:5]:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-4
    sparse = {(r["doc_id"], r["i"]): r["val"]
              for r in text_embedding_sparse(docs, "doc_id", "text", dim=32).collect()}
    for r in rows[:5]:
        for i, v in enumerate(r["embedding"]):
            if v != 0.0:
                assert abs(sparse[(r["doc_id"], i)] - v) < 1e-9
    q = dense.filter(F.col("doc_id") < 3)
    top = SIM.topk_cosine(dense, q, "doc_id", "embedding", k=3)
    got = top.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in got) and len(got) == 3


def test_winnow_md5_udf_matches_sql_twin(spark):
    """The map-only Arrow path and the pure-built-in window-function path
    must select identical fingerprints (same oracle-checked semantics)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    a = {r["doc_id"]: (r["n_fp"], r["fp_hash"])
         for r in TS.winnow_features(docs, "doc_id", "text").collect()}
    b = {r["doc_id"]: (r["n_fp"], r["fp_hash"])
         for r in TS.winnow_features_sql(docs, "doc_id", "text").collect()}
    assert a == b and len(a) > 0
    # and both agree with the plain-python reference on one doc
    some_id, (n_fp, fp_hash) = next(iter(a.items()))
    text = docs.filter(F.col("doc_id") == some_id).first()["text"]
    assert TS.winnow_md5(text) == (n_fp, fp_hash)


def test_cosine_pairs_exact_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(matn @ matn.T, 6)
    want = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.4
    }
    got = {
        (r["a"], r["b"])
        for r in SIM.cosine_pairs_exact(emb, "vec_id", "embedding", 0.4).collect()
    }
    assert got == want and len(want) > 0


def test_cosine_near_dup_planted(spark):
    """Planted near-identical vectors (angle ~0) always share an SRP bucket
    — the bucketed clusterer must recover exactly the planted clusters,
    and every reported co-member must really clear tau (precision 1 by
    construction: candidates are exact-verified)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # two planted dups of each: tiny perturbation, cosine ~ 0.999
        for j in (1, 2):
            d = v + rng.normal(scale=1e-3, size=16).astype("float32")
            rows.append((100 * (j + 1) + i, [float(x) for x in d]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["rep"]
        for r in SIM.cosine_near_dup(
            df, "vec_id", "embedding", dim=16, tau=0.99, planes=6
        ).collect()
    }
    assert len(got) == 60
    for i in range(20):
        assert got[i] == got[200 + i] == got[300 + i] == i
    # distinct base vectors (random gaussians) must NOT merge
    assert len(set(got.values())) == 20


def test_cosine_near_dup_agrees_with_exact(spark, emb):
    """On the driver's embeddings table the bucketed path must find the
    SAME clusters as the exact pipeline at high tau (planted-duplicate
    regime: near-identical vectors collide in every band), and never
    invent an edge (precision 1 at any tau)."""
    from gstored_spark.operators.cc import components_with_singletons

    tau = 0.4
    exact_pairs = SIM.cosine_pairs_exact(emb, "vec_id", "embedding", tau)
    exact = {
        r["vertex"]: r["component"]
        for r in components_with_singletons(
            exact_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            emb.select(F.col("vec_id").alias("vertex")),
        ).collect()
    }
    # tau=0.4 is far below the near-dup regime (angle ~66deg): SRP
    # per-plane collision is only ~0.63, so the stress test runs SHALLOW
    # buckets (2 planes + Hamming-1 probes cover ~0.86 of pairs; transitive
    # closure through clusters recovers more)
    got = {
        r["vec_id"]: r["rep"]
        for r in SIM.cosine_near_dup(
            emb, "vec_id", "embedding", dim=64, tau=tau, planes=2
        ).collect()
    }
    # precision: a bucketed merge implies an exact merge (clusters refine)
    exact_cluster_of = exact
    for vid, rep in got.items():
        if rep != vid:
            assert exact_cluster_of[vid] == exact_cluster_of[rep]
    # recall at 4 planes + multiprobe on 64-dim: most exact merges found
    merged_exact = sum(1 for v, r in exact.items() if r != v)
    found = sum(1 for v, r in exact.items() if r != v and got[v] != v)
    if merged_exact:
        assert found / merged_exact >= 0.6


def test_cosine_pairs_exact_guards_driver_collect(spark, emb, monkeypatch):
    """The exact-pairs baseline refuses to collect an over-limit matrix to
    the driver and points the caller at the bucketed scale path."""
    import pytest as _pytest

    monkeypatch.setattr(SIM, "EXACT_PAIRS_MAX_ROWS", 3)
    with _pytest.raises(ValueError, match="cosine_near_dup"):
        SIM.cosine_pairs_exact(emb, "vec_id", "embedding", 0.4)
