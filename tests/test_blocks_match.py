"""BGP matching over the EMITTED artifact (adjacency parquet + signature
tables): result equality with the flat-view matcher, and real partition
pruning — the signature scan must read a strict subset of part= directories
(VS*-tree upper-level skip re-expressed as datasource partition pruning)."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg import blocks as B
from gstored_spark.kg import ids as I
from gstored_spark.kg import partition as P
from gstored_spark.kg.match import (
    candidate_terms_pruned,
    match_over_blocks,
    pruned_partitions,
    query_var_signatures,
)
from gstored_spark.kg.pipeline import PipelineResult
from gstored_spark.plans.bgp import TriplePattern, match_bgp

N_PARTS = 4


@pytest.fixture(scope="module")
def toy_artifact(spark, tmp_path_factory):
    """Tiny sparse graph: signatures stay unsaturated, so partition-level
    OR-signatures genuinely exclude partitions (at production scale the
    same effect needs finer partitioning — same mechanism)."""
    rows = []
    for i in range(12):
        rows.append((f"<ent:a{i}>", "<p:knows>", f"<ent:a{(i + 1) % 12}>", True))
    rows.append(("<ent:special>", "<p:rare>", "<ent:a0>", True))
    rows.append(("<ent:special>", "<p:knows>", "<ent:a3>", True))
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, N_PARTS)
    internal = P.internal_vertices(routed, N_PARTS)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, pred_dict, entity_dict)
    part_sig = B.partition_signature(B.partitioned_signatures(sigs, internal))
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    out = str(tmp_path_factory.mktemp("artifact"))
    B.write_artifact(res, out)
    return triples, B.GraphArtifact(spark, out)


PATS = [
    TriplePattern("?x", "<p:rare>", "?y"),
    TriplePattern("?x", "<p:knows>", "?z"),
]


def test_blocks_match_equals_flat(spark, toy_artifact):
    triples, art = toy_artifact
    flat = {tuple(r) for r in match_bgp(triples, PATS, ["?x", "?y", "?z"]).collect()}
    blocks = {
        tuple(r)
        for r in match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1).collect()
    }
    assert blocks == flat
    assert flat == {("<ent:special>", "<ent:a0>", "<ent:a3>")}


def test_blocks_triple_reconstitution_exact(spark, toy_artifact):
    """explode(out) over internal vertices reproduces the exact triple bag
    (crossing replicas contribute nothing twice)."""
    triples, art = toy_artifact
    ids = B.triples_from_adjacency(art.adjacency)
    assert ids.count() == triples.count()
    assert ids.distinct().count() == triples.distinct().count()


def test_partition_pruning_strict_subset(spark, toy_artifact):
    """The ?x candidate scan (rare predicate) must plan a part IN (...)
    partition filter over a strict subset of the part= directories, and
    pruning must be sound (every partition holding a true binding kept)."""
    triples, art = toy_artifact
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    qsigs = query_var_signatures(PATS, pred_ids)
    keep = {r["part"] for r in pruned_partitions(art.part_sig, qsigs["x"]).collect()}
    all_parts = {r["part"] for r in art.part_sig.select("part").collect()}
    assert keep < all_parts, f"no pruning happened: keep={keep} all={all_parts}"

    terms, scan = candidate_terms_pruned(art, qsigs["x"])
    # formatted explain carries the full (untruncated) FileScan metadata:
    # the part IN (...) list must be exactly the kept partitions
    jqe = scan._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = jqe.explainString(mode)
    import re

    m = re.search(r"PartitionFilters: \[part#\d+ IN \(([0-9,]+)\)\]", plan)
    assert m, f"no partition filter in plan:\n{plan[:2000]}"
    assert {int(x) for x in m.group(1).split(",")} == keep
    # soundness: every true ?x binding is a candidate
    got = {r["term"] for r in terms.collect()}
    assert "<ent:special>" in got

def test_blocks_match_id_mode_equals_string_mode(spark, toy_artifact):
    """decode='ids' (constants encoded, matching on long columns, results
    decoded at the end — the reference's StringIndex placement) must return
    identical bindings to decode='triples'."""
    triples, art = toy_artifact
    a = {tuple(r) for r in
         match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1).collect()}
    b = {tuple(r) for r in
         match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1,
                           decode="ids").collect()}
    assert a == b and len(a) > 0
    # unknown constant -> empty result, not an error (dictionary-miss
    # semantics of the reference)
    ghost = [TriplePattern("?x", "<p:rare>", "<ent:nosuch>")]
    assert match_over_blocks(art, ghost, ["?x"], min_degree=1, decode="ids").count() == 0
