"""Connected components vs a pure-python union-find; dedup operators."""

import random

import pytest
from pyspark.sql import functions as F

from gstored_spark.operators import dedup as D
from gstored_spark.operators.cc import components_with_singletons, connected_components


def _uf_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min member per component
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


@pytest.mark.parametrize("small", [0, 10**6], ids=["distributed", "driver-uf"])
def test_cc_matches_union_find(spark, small):
    rng = random.Random(7)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    want = _uf_components(n, edges)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    vdf = spark.createDataFrame([(i,) for i in range(n)], ["vertex"])
    got = {r["vertex"]: r["component"] for r in
           components_with_singletons(edf, vdf, small_graph_edges=small).collect()}
    assert got == want


def test_cc_long_chain(spark):
    # path graph: worst case for naive propagation; star-contraction must
    # converge within max_iter double-rounds (O(log n) rounds total)
    n = 128
    edf = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    got = connected_components(edf, max_iter=8, small_graph_edges=0)
    comps = {r["component"] for r in got.collect()}
    assert comps == {0}
    assert got.count() == n


@pytest.mark.parametrize("small", [0, 10**6], ids=["distributed", "driver-uf"])
def test_cc_string_ids(spark, small):
    edf = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], ["src", "dst"]
    )
    got = {r["vertex"]: r["component"] for r in
           connected_components(edf, small_graph_edges=small).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    got = {r["content_hash"]: (r["keep_id"], r["dup_count"])
           for r in D.exact_dedup(df, "doc_id", "text").collect()}
    assert sorted(v for v in got.values()) == [(1, 2), (3, 1)]


def test_minhash_dedup_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely unrelated text about spark shuffles and parquet files " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    comp = {r["vertex"]: r["component"] for r in
            D.minhash_dedup(df, "doc_id", "text", threshold=0.5).collect()}
    assert comp[1] == comp[2]
    assert comp[3] != comp[1]


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["id", "t"])
    row = df.select(D.word_shingles(F.col("t"), 3).alias("sh")).first()
    assert row["sh"] == ["a b c", "b c d"]
    row = df.select(D.char_shingles(F.lit("abcd"), 3).alias("sh")).first()
    assert row["sh"] == ["abc", "bcd"]


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        ["doc_id", "text"],
    )
    sh = {r["doc_id"]: r["simhash"] for r in
          D.simhash_hex(df, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    assert len(sh[1]) == 16 and all(c in "0123456789abcdef" for c in sh[1])
    hdf = spark.createDataFrame([(sh[1], sh[3])], ["a", "b"])
    dist = hdf.select(D.hamming_hex(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert 0 < dist <= 64
    same = hdf.select(D.hamming_hex(F.col("a"), F.col("a")).alias("d")).first()["d"]
    assert same == 0
