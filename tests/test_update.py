"""Incremental INSERT/DELETE maintenance (§2.10): ID allocation after the
namespace max, merge semantics, and partition-scoped adjacency rebuild."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg.blocks import adjacency
from gstored_spark.kg.ids import (
    LITERAL_FIRST_ID,
    build_dictionaries,
    encode_triples,
)
from gstored_spark.kg.partition import internal_vertices, owner, route_triples
from gstored_spark.kg.update import (
    affected_partitions,
    apply_updates,
    extend_dictionaries,
    incremental_adjacency,
)

N_PARTS = 4


@pytest.fixture(scope="module")
def base(spark):
    rows = [
        ("<a>", "<p1>", "<b>", True),
        ("<b>", "<p1>", "<c>", True),
        ("<c>", "<p2>", '"x"@en', False),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    ed, ld, pdd = build_dictionaries(t)
    it = encode_triples(t, ed, ld, pdd).persist()
    it.count()
    return t, ed, ld, pdd, it


def test_extend_dictionaries_appends_after_max(spark, base):
    t, ed, ld, pdd, it = base
    new = spark.createDataFrame(
        [("<a>", "<p1>", "<zz_new>", True), ("<zz_new>", "<p9>", '"new lit"@en', False)],
        ["subj", "pred", "obj", "o_is_entity"],
    )
    ed2, ld2, pdd2 = extend_dictionaries(new, ed, ld, pdd)
    old_max = max(r["id"] for r in ed.collect())
    new_ent = {r["term"]: r["id"] for r in ed2.collect()}
    assert new_ent["<zz_new>"] == old_max + 1
    assert {r["term"] for r in ed.collect()} < set(new_ent)
    lit_ids = {r["term"]: r["id"] for r in ld2.collect()}
    assert lit_ids['"new lit"@en'] >= LITERAL_FIRST_ID
    pred_ids = {r["term"]: r["id"] for r in pdd2.collect()}
    assert pred_ids["<p9>"] == 2  # appended after existing 2 predicates


def test_apply_updates_merge_semantics(spark, base):
    t, ed, ld, pdd, it = base
    ins = it.limit(1)  # duplicate insert -> no change (distinct)
    assert apply_updates(it, ins, None).count() == it.count()
    dele = it.limit(1).select("s", "p", "o")
    assert apply_updates(it, None, dele).count() == it.count() - 1


def test_incremental_adjacency_matches_full_rebuild(spark, base):
    t, ed, ld, pdd, it = base
    new = spark.createDataFrame(
        [("<a>", "<p1>", "<c>", True)], ["subj", "pred", "obj", "o_is_entity"]
    )
    enc_new = encode_triples(new, ed, ld, pdd)
    merged = apply_updates(it, enc_new, None).persist()
    # incremental result
    old_routed = route_triples(it, N_PARTS)
    old_adj = adjacency(old_routed, internal_vertices(old_routed, N_PARTS)).persist()
    inc = incremental_adjacency(old_adj, merged, enc_new, N_PARTS)
    # full rebuild reference
    routed = route_triples(merged, N_PARTS)
    full = adjacency(routed, internal_vertices(routed, N_PARTS))

    def norm(df):
        return {
            (r["part"], r["v"], r["is_internal"],
             tuple(map(tuple, r["out"])), tuple(map(tuple, r["in"])))
            for r in df.collect()
        }

    assert norm(inc) == norm(full)
    # and untouched partitions were NOT rebuilt (carried over)
    touched = {r["part"] for r in affected_partitions(enc_new, N_PARTS).collect()}
    assert touched and touched < set(range(N_PARTS)) or touched == set(range(N_PARTS))


def test_delete_where_and_modify(spark):
    """DELETE WHERE: bind the BGP, substitute bindings into each pattern,
    anti-join out (GeneralEvaluation.cpp:3008-3065); MODIFY composes the
    delete with an insert merge."""
    from gstored_spark.kg.ids import build_dictionaries, encode_triples
    from gstored_spark.kg.update import delete_where, delete_where_triples, modify
    from gstored_spark.plans.bgp import TriplePattern

    rows = [
        ("<e:a>", "<p:knows>", "<e:b>", True),
        ("<e:b>", "<p:knows>", "<e:c>", True),
        ("<e:a>", "<p:name>", '"al"@en', False),
        ("<e:c>", "<p:name>", '"cee"@en', False),
    ]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    # string level: delete every knows-edge of a subject that has a name
    pats = [TriplePattern("?x", "<p:knows>", "?y"), TriplePattern("?x", "<p:name>", "?n")]
    left = delete_where_triples(triples, pats)
    got = {(r["subj"], r["pred"], r["obj"]) for r in left.collect()}
    # <e:a> knows <e:b> deleted (a has a name) and both name triples deleted
    # (the second pattern's bindings are deleted too — DELETE WHERE removes
    # every matched pattern instantiation); <e:b> knows <e:c> survives
    assert got == {("<e:b>", "<p:knows>", "<e:c>"), ("<e:c>", "<p:name>", '"cee"@en')}

    # id level roundtrip + modify with an insert
    ent, lit, pred = build_dictionaries(triples)
    enc = encode_triples(triples, ent, lit, pred)
    after = delete_where(enc, pats, (ent, lit, pred))
    assert after.count() == 2
    ins = enc.limit(0)  # empty insert set: modify == delete_where
    assert modify(enc, pats, ins, (ent, lit, pred)).count() == 2
