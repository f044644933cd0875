"""ID free-list reuse after delete — vacuum (the initIDinfo scan analog,
Database.cpp:89-273) frees the IDs of no-longer-referenced terms, and
subsequent inserts re-issue them smallest-hole-first (allocate,
Database.cpp:275-411) before extending past the namespace max."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg import blocks as B
from gstored_spark.kg import ids as I
from gstored_spark.kg import partition as P
from gstored_spark.kg.ids import LITERAL_FIRST_ID
from gstored_spark.kg.pipeline import PipelineResult
from gstored_spark.kg.update import (
    assign_ids_reusing,
    update_artifact,
    vacuum_artifact,
    vacuum_dictionaries,
)

N_PARTS = 4

BASE_ROWS = [
    (f"<ent:a{i}>", "<p:knows>", f"<ent:a{(i + 1) % 8}>", True) for i in range(8)
] + [
    ("<ent:dead1>", "<p:rare>", "<ent:dead2>", True),
    ("<ent:dead1>", "<p:name>", '"doomed label"@en', False),
    ("<ent:a0>", "<p:name>", '"kept label"@en', False),
]

# removes every triple touching dead1/dead2: frees 2 entity ids, the
# '"doomed label"' literal id, and the <p:rare> predicate id (<p:name>
# stays live through the kept label)
DELETES = [
    ("<ent:dead1>", "<p:rare>", "<ent:dead2>"),
    ("<ent:dead1>", "<p:name>", '"doomed label"@en'),
]


def _write_full(spark, triples, out):
    e0, l0, p0 = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, e0, l0, p0)
    routed = P.route_triples(id_triples, N_PARTS)
    internal = P.internal_vertices(routed, N_PARTS)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, p0, e0)
    res = PipelineResult(
        triples=triples, entity_dict=e0, literal_dict=l0, pred_dict=p0,
        id_triples=id_triples, routed=routed, internal=internal,
        adjacency=adj, signatures=sigs,
        part_sig=B.partition_signature(B.partitioned_signatures(sigs, internal)),
    )
    B.write_artifact(res, out)
    return B.GraphArtifact(spark, out)


def test_assign_ids_reusing_smallest_hole_first(spark):
    terms = spark.createDataFrame([("c",), ("a",), ("b",), ("d",)], ["term"])
    free = spark.createDataFrame([(9,), (2,), (5,)], ["id"])
    got = {r["term"]: r["id"] for r in assign_ids_reusing(terms, "term", free, 40).collect()}
    # smallest term -> smallest hole; remainder appended at next_append
    assert got == {"a": 2, "b": 5, "c": 9, "d": 40}


def test_assign_ids_reusing_no_free_list(spark):
    terms = spark.createDataFrame([("b",), ("a",)], ["term"])
    got = {r["term"]: r["id"] for r in assign_ids_reusing(terms, "term", None, 7).collect()}
    assert got == {"a": 7, "b": 8}


def test_vacuum_dictionaries_frees_exactly_dead_ids(spark):
    base = spark.createDataFrame(BASE_ROWS, ["subj", "pred", "obj", "o_is_entity"])
    e0, l0, p0 = I.build_dictionaries(base)
    id_triples = I.encode_triples(base, e0, l0, p0)
    dele = I.encode_triples(
        spark.createDataFrame(
            [d + (True,) for d in DELETES[:1]] + [DELETES[1] + (False,)],
            ["subj", "pred", "obj", "o_is_entity"],
        ),
        e0, l0, p0,
    )
    live = id_triples.join(dele.select("s", "p", "o"), ["s", "p", "o"], "left_anti")
    e2, l2, p2, fe, fl, fp = vacuum_dictionaries(live, e0, l0, p0)
    dead_e = {r["id"] for r in e0.filter(
        F.col("term").isin("<ent:dead1>", "<ent:dead2>")).collect()}
    dead_l = {r["id"] for r in l0.filter(F.col("term") == '"doomed label"@en').collect()}
    dead_p = {r["id"] for r in p0.filter(F.col("term") == "<p:rare>").collect()}
    assert {r["id"] for r in fe.collect()} == dead_e and len(dead_e) == 2
    assert {r["id"] for r in fl.collect()} == dead_l and len(dead_l) == 1
    assert {r["id"] for r in fp.collect()} == dead_p and len(dead_p) == 1
    # vacuumed dictionaries hold no binding for any freed id
    assert e2.join(fe, "id", "leftsemi").count() == 0
    assert l2.join(fl, "id", "leftsemi").count() == 0
    assert p2.join(fp, "id", "leftsemi").count() == 0
    assert e2.count() == e0.count() - 2 and p2.count() == p0.count() - 1


@pytest.fixture(scope="module")
def vacuumed_store(spark, tmp_path_factory):
    art_dir = str(tmp_path_factory.mktemp("art_free"))
    base = spark.createDataFrame(BASE_ROWS, ["subj", "pred", "obj", "o_is_entity"])
    _write_full(spark, base, art_dir)
    dele = spark.createDataFrame(DELETES, ["subj", "pred", "obj"])
    update_artifact(spark, art_dir, deletes=dele)
    art = vacuum_artifact(spark, art_dir)
    return art_dir, art


def test_vacuum_artifact_persists_free_lists(spark, vacuumed_store):
    _, art = vacuumed_store
    by_ns = {r["ns"]: r["n"] for r in art.free_ids.groupBy("ns").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_ns == {0: 2, 1: 1, 2: 1}
    assert art.entity_dict.filter(F.col("term") == "<ent:dead1>").count() == 0
    assert art.pred_dict.filter(F.col("term") == "<p:rare>").count() == 0
    # namespace split survives: freed literal id is in the literal range
    lit_free = [r["id"] for r in art.free_ids.filter("ns = 1").collect()]
    assert all(i >= LITERAL_FIRST_ID for i in lit_free)


def test_insert_after_vacuum_reuses_holes(spark, vacuumed_store):
    art_dir, art = vacuumed_store
    free_e = sorted(r["id"] for r in art.free_ids.filter("ns = 0").collect())
    free_l = [r["id"] for r in art.free_ids.filter("ns = 1").collect()]
    free_p = [r["id"] for r in art.free_ids.filter("ns = 2").collect()]
    ins = spark.createDataFrame(
        [
            ("<ent:newA>", "<p:follows>", "<ent:newB>", True),
            ("<ent:newA>", "<p:knows>", "<ent:newC>", True),
            ("<ent:newA>", "<p:name>", '"fresh label"@en', False),
        ],
        ["subj", "pred", "obj", "o_is_entity"],
    )
    art2 = update_artifact(spark, art_dir, inserts=ins)
    got = {r["term"]: r["id"] for r in art2.entity_dict.filter(
        F.col("term").isin("<ent:newA>", "<ent:newB>", "<ent:newC>")).collect()}
    # 2 holes, 3 new entities: two smallest terms take the holes in order,
    # the third extends past BOTH the live max and the holes (the dead
    # terms here were the lexicographic tail, so the holes sit past the
    # vacuumed dictionary's max)
    max_e = art.entity_dict.agg(F.max("id")).first()[0]
    assert [got["<ent:newA>"], got["<ent:newB>"]] == free_e
    assert got["<ent:newC>"] == max(max_e, max(free_e)) + 1
    lit = art2.literal_dict.filter(F.col("term") == '"fresh label"@en').first()
    assert lit["id"] == free_l[0]
    pred = art2.pred_dict.filter(F.col("term") == "<p:follows>").first()
    assert pred["id"] == free_p[0]
    # every hole was consumed -> free list is now empty, and no id is
    # bound twice anywhere
    assert art2.free_ids.count() == 0
    for d in (art2.entity_dict, art2.literal_dict, art2.pred_dict):
        n = d.count()
        assert d.select("id").distinct().count() == n
        assert d.select("term").distinct().count() == n
    # the store still decodes losslessly: logical bag == expected strings
    term_dict = art2.entity_dict.unionByName(art2.literal_dict)
    bag = art2.triples_by_pred.select("s", "p", "o")
    t = I.decode_ids(bag, "s", term_dict, "subj")
    t = I.decode_ids(t, "p", art2.pred_dict, "pred")
    t = I.decode_ids(t, "o", term_dict, "obj")
    got_triples = {(r["subj"], r["pred"], r["obj"]) for r in t.collect()}
    expected = {
        (s, p, o) for (s, p, o, _) in BASE_ROWS if (s, p, o) not in set(DELETES)
    } | {
        ("<ent:newA>", "<p:follows>", "<ent:newB>"),
        ("<ent:newA>", "<p:knows>", "<ent:newC>"),
        ("<ent:newA>", "<p:name>", '"fresh label"@en'),
    }
    assert got_triples == expected
