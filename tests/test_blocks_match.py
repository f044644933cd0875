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
    # a predicate IRI that is also a subject (legal RDF): exercises the
    # mixed-position-var decode fallback
    rows.append(("<p:knows>", "<p:knows>", "<ent:a0>", True))
    # a literal object: exercises the literal-offset signature bits
    rows.append(("<ent:special>", "<p:name>", '"special one"@en', False))
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
    """The ?x candidate scan (rare predicate) must plan a (part, bucket)
    partition filter over a strict subset of the part=/bucket= directories,
    and pruning must be sound (every group holding a true binding kept)."""
    from gstored_spark.kg.match import pruned_buckets

    triples, art = toy_artifact
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    qsigs = query_var_signatures(PATS, pred_ids)
    keep = {r["part"] for r in pruned_partitions(art.part_sig, qsigs["x"]).collect()}
    all_parts = {r["part"] for r in art.part_sig.select("part").collect()}
    assert keep < all_parts, f"no pruning happened: keep={keep} all={all_parts}"
    kept_pairs = {
        (r["part"], r["bucket"])
        for r in pruned_buckets(art.bucket_sig, qsigs["x"]).collect()
    }
    all_pairs = {
        (r["part"], r["bucket"])
        for r in art.bucket_sig.select("part", "bucket").collect()
    }
    assert kept_pairs < all_pairs
    assert {p for p, _ in kept_pairs} <= keep  # bucket OR ⊆ partition OR

    terms, scan = candidate_terms_pruned(art, qsigs["x"])
    # formatted explain carries the full (untruncated) FileScan metadata:
    # both partition columns must appear in the scan's PartitionFilters
    jqe = scan._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = jqe.explainString(mode)
    import re

    m = re.search(r"PartitionFilters: \[(.+)\]", plan)
    assert m, f"no partition filter in plan:\n{plan[:2000]}"
    assert "part#" in m.group(1) and "bucket#" in m.group(1)
    # the scan must actually read only the kept (part, bucket) groups
    scanned = {(r["part"], r["bucket"]) for r in scan.select("part", "bucket").collect()}
    assert scanned <= kept_pairs
    # soundness: every true ?x binding is a candidate
    got = {r["term"] for r in terms.collect()}
    assert "<ent:special>" in got


def test_bucket_pruning_when_root_saturated(spark, tmp_path_factory):
    """VS*-tree inner level: every partition's root OR-signature covers the
    rare-predicate query bit (one rare-edge vertex per partition -> root
    pruning degenerates to keep-everything), yet the bucket level still
    skips most bucket groups (VSTree.cpp:146-219 parent-OR, one level
    down)."""
    from gstored_spark.kg.match import pruned_buckets

    rows = []
    for i in range(48):
        rows.append((f"<ent:v{i}>", "<p:knows>", f"<ent:v{(i + 1) % 48}>", True))
    for i in range(0, 48, 3):  # rare-edge vertices spread over all partitions
        rows.append((f"<ent:v{i}>", "<p:rare>", f"<ent:v{(i + 5) % 48}>", True))
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
    out = str(tmp_path_factory.mktemp("saturated"))
    B.write_artifact(res, out)
    art = B.GraphArtifact(spark, out)

    pats = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?x", "<p:knows>", "?z"),
    ]
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    qsigs = query_var_signatures(pats, pred_ids)
    keep = {r["part"] for r in pruned_partitions(art.part_sig, qsigs["x"]).collect()}
    all_parts = {r["part"] for r in art.part_sig.select("part").collect()}
    if keep != all_parts:
        pytest.skip("root level not saturated in this hash layout")
    kept_pairs = {
        (r["part"], r["bucket"])
        for r in pruned_buckets(art.bucket_sig, qsigs["x"]).collect()
    }
    all_pairs = {
        (r["part"], r["bucket"])
        for r in art.bucket_sig.select("part", "bucket").collect()
    }
    assert kept_pairs < all_pairs, "bucket level pruned nothing"
    # and the query still answers correctly from the store
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x", "?y", "?z"]).collect()}
    blocks = {
        tuple(r)
        for r in match_over_blocks(art, pats, ["?x", "?y", "?z"], min_degree=1).collect()
    }
    assert blocks == flat and len(flat) > 0

def test_vertex_signatures_from_ids_bit_identical(spark, toy_artifact):
    """The id-based signature build (per-term hashing + long joins) must be
    bit-identical to the per-occurrence string path it replaces."""
    triples, art = toy_artifact
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    old = {
        r["v"]: tuple(r["sig"])
        for r in B.vertex_signatures(triples, pred_dict, entity_dict).collect()
    }
    new = {
        r["v"]: tuple(r["sig"])
        for r in B.vertex_signatures_from_ids(
            id_triples, entity_dict, literal_dict
        ).collect()
    }
    assert new == old and len(new) > 0
    # the pure-catalyst term-bits variant must be bit-identical too
    col = {
        r["v"]: tuple(r["sig"])
        for r in B.vertex_signatures_from_ids(
            id_triples, entity_dict, literal_dict, term_bits_impl="col"
        ).collect()
    }
    assert col == old


def test_blocks_match_id_mode_equals_string_mode(spark, toy_artifact):
    """decode='ids' (constants encoded, matching on long columns, results
    decoded at the end — the reference's StringIndex placement) must return
    identical bindings to decode='triples'."""
    triples, art = toy_artifact
    a = {tuple(r) for r in
         match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1,
                           decode="triples").collect()}
    b = {tuple(r) for r in
         match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1,
                           decode="ids").collect()}
    auto = {tuple(r) for r in
            match_over_blocks(art, PATS, ["?x", "?y", "?z"], min_degree=1).collect()}
    assert a == b == auto and len(a) > 0
    # unknown constant -> empty result, not an error (dictionary-miss
    # semantics of the reference)
    ghost = [TriplePattern("?x", "<p:rare>", "<ent:nosuch>")]
    assert match_over_blocks(art, ghost, ["?x"], min_degree=1, decode="ids").count() == 0


def test_mixed_position_var_falls_back_to_string_mode(spark, toy_artifact):
    """A var in BOTH the predicate and a subject/object position cannot be
    id-decoded (predicate ids overlap entity ids); decode='auto'/'ids' must
    fall back to the string-level path and still answer correctly."""
    triples, art = toy_artifact
    pats = [
        TriplePattern("?x", "?e", "?y"),
        TriplePattern("?e", "<p:knows>", "?z"),
    ]
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x", "?e", "?z"]).collect()}
    for mode in ("auto", "ids", "triples"):
        got = {tuple(r) for r in match_over_blocks(
            art, pats, ["?x", "?e", "?z"], min_degree=1, decode=mode).collect()}
        assert got == flat, mode
    assert len(flat) > 0


def test_satellite_predicate_prefilter(spark, toy_artifact):
    """F4 (Join::filterBySatellites, Join.cpp:2419-2700): a degree-1
    subject var with a constant predicate gets its candidates from the
    per-vertex out-predicate sets; the filter is sound (results unchanged)
    and strict (fewer candidates than subjects)."""
    from gstored_spark.kg.blocks import vertex_predicate_sets

    triples, art = toy_artifact
    pats = [TriplePattern("?x", "<p:rare>", "?y")]  # degree-1 ?x
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x", "?y"]).collect()}
    got = {tuple(r) for r in
           match_over_blocks(art, pats, ["?x", "?y"]).collect()}
    assert got == flat == {("<ent:special>", "<ent:a0>")}
    # strictness: the predicate-set filter admits only vertices carrying
    # the rare out-predicate
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    psets = vertex_predicate_sets(art.adjacency.filter("is_internal"))
    n_cand = psets.filter(
        F.array_contains("out_preds", pred_ids["<p:rare>"])
    ).select("v").distinct().count()
    n_subjects = psets.filter(F.size("out_preds") > 0).select("v").distinct().count()
    assert n_cand == 1 < n_subjects


def test_match_partitioned_assembly_parity(spark, toy_artifact):
    """PE-and-assembly (match_partitioned) must equal the store matcher on
    both lifecycle shapes: the star short-circuit (all patterns share the
    subject var — complete local matches, no assembly,
    Database.cpp:661-671) and the general chain (local partial matches +
    cross-partition dedupe + greedy-ordered hash joins,
    Util.cpp:1777-1858)."""
    from gstored_spark.kg.match import match_partitioned
    from gstored_spark.plans.bgp import is_star

    triples, art = toy_artifact
    # PATS is a star: both patterns share subject ?x
    assert is_star(PATS)
    flat = {tuple(r) for r in match_bgp(triples, PATS, ["?x", "?y", "?z"]).collect()}
    got = {tuple(r) for r in
           match_partitioned(art, PATS, ["?x", "?y", "?z"]).collect()}
    assert got == flat and len(flat) > 0
    # general (chain) shape: crossing edges force real assembly
    chain = [
        TriplePattern("?x", "<p:knows>", "?y"),
        TriplePattern("?y", "<p:knows>", "?z"),
    ]
    flat = {tuple(r) for r in match_bgp(triples, chain, ["?x", "?y", "?z"]).collect()}
    got = {tuple(r) for r in
           match_partitioned(art, chain, ["?x", "?y", "?z"]).collect()}
    # 12 cycle steps + special->a3->a4 + <p:knows>->a0->a1
    assert got == flat and len(flat) == 14


def test_ask_partitioned_lecf(spark, toy_artifact):
    """LEC-feature ASK (Util::HashLECFJoin semantics): true on satisfiable
    chains/stars, false on unsatisfiable ones; feature projection must not
    manufacture solutions (the cross-pattern constraints ride the
    interface vars)."""
    from gstored_spark.kg.match import ask_partitioned

    triples, art = toy_artifact
    chain = [
        TriplePattern("?x", "<p:knows>", "?y"),
        TriplePattern("?y", "<p:knows>", "?z"),
    ]
    assert ask_partitioned(art, chain).collect() == [(True,)]
    # star with a rare predicate: only <ent:special> satisfies both
    assert ask_partitioned(art, PATS).collect() == [(True,)]
    # unsatisfiable: nothing has a <p:rare> out-edge from a <p:rare> target
    no = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?y", "<p:rare>", "?z"),
    ]
    assert ask_partitioned(art, no).collect() == []
    # disconnected groups (no shared vars): both nonempty -> true
    disc = [
        TriplePattern("?a", "<p:rare>", "?b"),
        TriplePattern("?c", "<p:name>", "?d"),
    ]
    assert ask_partitioned(art, disc).collect() == [(True,)]
    # disconnected with one empty side -> false
    disc_no = [
        TriplePattern("?a", "<p:rare>", "?b"),
        TriplePattern("?c", "<p:none>", "?d"),
    ]
    assert ask_partitioned(art, disc_no).collect() == []


def test_eval_group_partitioned_parity(spark, toy_artifact):
    """Group combinators (OPTIONAL/UNION/MINUS/FILTER) over PE-assembled
    leaf BGPs must equal the flat-view eval_group — the TempResult
    combinators are agnostic to how leaves were answered."""
    from gstored_spark.kg.match import eval_group_partitioned
    from gstored_spark.plans.bgp import GroupPattern, eval_group

    triples, art = toy_artifact
    shapes = [
        GroupPattern(  # OPTIONAL: some <p:knows> subjects lack <p:name>
            patterns=[TriplePattern("?x", "<p:knows>", "?y")],
            optionals=[GroupPattern(patterns=[TriplePattern("?x", "<p:name>", "?n")])],
        ),
        GroupPattern(  # UNION of different predicates
            patterns=[TriplePattern("?x", "<p:knows>", "?y")],
            unions=[
                GroupPattern(patterns=[TriplePattern("?x", "<p:rare>", "?z")]),
                GroupPattern(patterns=[TriplePattern("?x", "<p:name>", "?z")]),
            ],
        ),
        GroupPattern(  # MINUS + FILTER
            patterns=[TriplePattern("?x", "<p:knows>", "?y")],
            minus=[GroupPattern(patterns=[TriplePattern("?x", "<p:rare>", "?w")])],
            filters=["x != y"],
        ),
    ]
    for g in shapes:
        flat = {tuple(r) for r in eval_group(triples, g).collect()}
        got = {tuple(r) for r in eval_group_partitioned(art, g).collect()}
        assert got == flat and len(flat) > 0


def test_adjacency_single_shuffle_shape_equivalence(spark, toy_artifact):
    """The fused one-exchange adjacency (tagged union + conditional
    collect_lists, inline is_internal arithmetic) must be row-identical to
    the r5 shape (two groupBys + full_outer join + internal join) on a
    graph with literal objects, crossing edges, and in-only/out-only
    vertices."""
    triples, _ = toy_artifact
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, N_PARTS)
    internal = P.internal_vertices(routed, N_PARTS)

    # reference implementation: the pre-r6 shape, verbatim
    out_edges = routed.groupBy("part", F.col("s").alias("v")).agg(
        F.sort_array(F.collect_list(F.struct(F.col("p"), F.col("o")))).alias("out")
    )
    in_edges = routed.filter("o_is_entity").groupBy("part", F.col("o").alias("v")).agg(
        F.sort_array(F.collect_list(F.struct(F.col("p"), F.col("s")))).alias("in")
    )
    old = (
        out_edges.join(in_edges, ["part", "v"], "full_outer")
        .join(internal, ["part", "v"], "left")
        .select(
            "part", "v",
            F.coalesce("is_internal", F.lit(False)).alias("is_internal"),
            F.coalesce("out", F.array().cast("array<struct<p:long,o:long>>")).alias("out"),
            F.coalesce("in", F.array().cast("array<struct<p:long,s:long>>")).alias("in"),
        )
    )

    def norm(df):
        return {
            (r["part"], r["v"], r["is_internal"],
             tuple((e["p"], e["o"]) for e in r["out"]),
             tuple((e["p"], e["s"]) for e in r["in"]))
            for r in df.collect()
        }

    new_inline = B.adjacency(routed, internal, n_parts=N_PARTS)
    new_join = B.adjacency(routed, internal)
    expected = norm(old)
    assert norm(new_inline) == expected
    assert norm(new_join) == expected
    # in-only and out-only vertices must both be present with empty arrays
    rows = {r["v"]: r for r in new_inline.collect()}
    assert any(len(r["out"]) == 0 for r in rows.values())
