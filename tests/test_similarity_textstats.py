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
