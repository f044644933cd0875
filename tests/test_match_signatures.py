"""Signature-prefiltered BGP matching: identical results to the plain
matcher, with genuinely pruned candidate sets and partition pruning that
never loses a match (F1/F2 semantics, VSTree retrieval analog)."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg.match import (
    candidate_terms,
    match_with_signatures,
    pruned_partitions,
    query_var_signatures,
)
from gstored_spark.kg.pipeline import run_pipeline
from gstored_spark.plans.bgp import TriplePattern, match_bgp

TRIANGLE = [
    TriplePattern("?a", "<rel:spouse>", "?d"),
    TriplePattern("?f", "<rel:director>", "?d"),
    TriplePattern("?f", "<rel:starring>", "?a"),
]


@pytest.fixture(scope="module")
def built(spark, docs200):
    res = run_pipeline(spark, docs200, n_parts=4)
    res.triples.persist().count()
    res.signatures.persist().count()
    return res


def test_prefiltered_match_equals_plain(spark, built):
    plain = {
        tuple(r)
        for r in match_bgp(built.triples, TRIANGLE, ["?a", "?d", "?f"]).distinct().collect()
    }
    pre = {
        tuple(r)
        for r in match_with_signatures(
            built.triples, built.signatures, built.entity_dict, built.pred_dict,
            TRIANGLE, ["?a", "?d", "?f"],
        ).distinct().collect()
    }
    assert pre == plain
    assert len(plain) > 0


def test_candidates_actually_prune(spark, built):
    pred_ids = {r["term"]: r["id"] for r in built.pred_dict.collect()}
    qsigs = query_var_signatures(TRIANGLE, pred_ids)
    n_entities = built.entity_dict.count()
    # ?f must have both director and starring out-edges -> candidates are a
    # strict subset of all entities
    n_f = candidate_terms(built.signatures, built.entity_dict, qsigs["f"]).count()
    assert 0 < n_f < n_entities
    # every true binding is among the candidates (containment is a
    # necessary condition)
    bindings = match_bgp(built.triples, TRIANGLE, ["?f"]).distinct()
    cand = candidate_terms(built.signatures, built.entity_dict, qsigs["f"]).withColumnRenamed("term", "f")
    missing = bindings.join(cand, "f", "left_anti").count()
    assert missing == 0


def test_partition_pruning_sound(spark, built):
    pred_ids = {r["term"]: r["id"] for r in built.pred_dict.collect()}
    qsigs = query_var_signatures(TRIANGLE, pred_ids)
    keep = {r["part"] for r in pruned_partitions(built.part_sig, qsigs["f"]).collect()}
    # soundness: every partition holding a true ?f binding survives pruning
    bindings = match_bgp(built.triples, TRIANGLE, ["?f"]).distinct()
    bound_ids = bindings.join(
        built.entity_dict.select(F.col("term").alias("f"), F.col("id").alias("v")), "f"
    )
    parts_with_matches = {
        r["part"]
        for r in bound_ids.join(built.internal.filter("is_internal"), "v").select("part").distinct().collect()
    }
    assert parts_with_matches <= keep


def test_shared_literal_object_var_not_prefiltered(spark, built):
    """An object-only var can bind literals (here: ?x = a name literal
    shared by two subjects). Literals have no entity signature, so
    prefiltering ?x would silently drop every binding — the prefilter must
    apply only to subject-position vars (Join::add_literal_candidate
    semantics, Database/Join.cpp:2242-2395)."""
    pats = [
        TriplePattern("?a", "<rel:name>", "?x"),
        TriplePattern("?b", "<rel:spouse>", "?a"),
    ]
    plain = {
        tuple(r) for r in match_bgp(built.triples, pats, ["?a", "?x", "?b"]).distinct().collect()
    }
    pre = {
        tuple(r)
        for r in match_with_signatures(
            built.triples, built.signatures, built.entity_dict, built.pred_dict,
            pats, ["?a", "?x", "?b"], min_degree=1,
        ).distinct().collect()
    }
    assert pre == plain
    assert len(plain) > 0


def test_unknown_predicate_yields_empty(spark, built):
    pats = [TriplePattern("?x", "<rel:nonexistent>", "?y"),
            TriplePattern("?x", "<rel:spouse>", "?z")]
    out = match_with_signatures(
        built.triples, built.signatures, built.entity_dict, built.pred_dict, pats
    )
    assert out.count() == 0
