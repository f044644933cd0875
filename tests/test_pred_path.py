"""Round-4 physical access paths + planner fixes:

- predicate-FIRST routing (triples_by_pred/, the p2s/p2o analog of
  KVstore/KVstore.h:265-293 dispatched by Strategy.cpp:272-362): a
  constant-predicate pattern over the artifact must scan only its
  pbucket= directory with the p filter pushed to parquet — never the
  adjacency explode;
- persisted s2p/o2p predicate sets (vertex_preds/) backing the F4
  satellite prefilter without touching the adjacency store;
- adaptive signature-bucket count (VS*-tree growth analog,
  VSTree.cpp:371-440);
- fanout-aware cardinality ordering (subIDpreID2num analog) in both the
  artifact path and parsed/flat queries;
- UNION branches with heterogeneous var sets (TempResult per-varset
  groups); is_star center-reuse rejection; star ownership under a
  partial partition map; ASK over the artifact.
"""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg import blocks as B
from gstored_spark.kg import ids as I
from gstored_spark.kg import partition as P
from gstored_spark.kg.match import ask_over_blocks, match_over_blocks, match_partitioned
from gstored_spark.kg.pipeline import PipelineResult
from gstored_spark.plans.bgp import (
    GroupPattern,
    TriplePattern,
    eval_group,
    greedy_order,
    is_star,
    match_bgp,
    predicate_counts,
)

N_PARTS = 4


def _build(spark, rows, out, partition_map=None, **write_kw):
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, N_PARTS, partition_map)
    internal = P.internal_vertices(routed, N_PARTS, partition_map)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures_from_ids(id_triples, entity_dict, literal_dict)
    part_sig = B.partition_signature(B.partitioned_signatures(sigs, internal))
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    B.write_artifact(res, out, **write_kw)
    return triples, B.GraphArtifact(spark, out)


def _rows():
    rows = []
    for i in range(12):
        rows.append((f"<ent:a{i}>", "<p:knows>", f"<ent:a{(i + 1) % 12}>", True))
    rows.append(("<ent:special>", "<p:rare>", "<ent:a0>", True))
    rows.append(("<ent:special>", "<p:knows>", "<ent:a3>", True))
    return rows


@pytest.fixture(scope="module")
def artifact(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pred_path"))
    return _build(spark, _rows(), out)


def _fmt_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def test_constant_predicate_routes_to_pred_table(spark, artifact):
    """`?s <p:rare> ?o` must be answered from triples_by_pred with pbucket
    directory pruning + a pushed p filter — no adjacency scan at all."""
    triples, art = artifact
    pats = [TriplePattern("?s", "<p:rare>", "?o")]
    out = match_over_blocks(art, pats, ["?s", "?o"])
    plan = _fmt_plan(out)
    assert "triples_by_pred" in plan
    assert "/adjacency" not in plan, "predicate-first query still scans adjacency"
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*pbucket[^\]]*)\]", plan)
    assert pf, f"no pbucket partition filter:\n{plan[:3000]}"
    assert "PushedFilters" in plan
    got = {tuple(r) for r in out.collect()}
    assert got == {("<ent:special>", "<ent:a0>")}


def test_pred_table_exact_bag(spark, artifact):
    """triples_by_pred is the exact triple bag (same count/distinct as the
    source), so full-bag matching over it is loss-free."""
    triples, art = artifact
    assert art.triples_by_pred.count() == triples.count()
    assert (
        art.triples_by_pred.select("s", "p", "o").distinct().count()
        == triples.distinct().count()
    )


def test_routing_matches_flat_all_modes(spark, artifact):
    triples, art = artifact
    pats = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?x", "<p:knows>", "?z"),
    ]
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x", "?y", "?z"]).collect()}
    for mode in ("auto", "ids", "triples"):
        got = {tuple(r) for r in match_over_blocks(
            art, pats, ["?x", "?y", "?z"], min_degree=1, decode=mode).collect()}
        assert got == flat, mode
    assert len(flat) > 0


def test_satellite_prefilter_reads_persisted_sets(spark, artifact):
    """F4 candidates must come from the PERSISTED vertex_preds table
    (KVstore.h:265-293 s2p), not a per-query derivation over adjacency.
    The shape requires TWO out-predicates of ?x so the requirement set is
    informative (each leaf pruned by the other's predicate)."""
    triples, art = artifact
    assert art.vertex_preds is not None
    pats = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?x", "<p:knows>", "?z"),
    ]
    plan = _fmt_plan(match_over_blocks(art, pats, ["?x", "?y", "?z"]))
    assert "vertex_preds" in plan
    assert "/adjacency" not in plan
    got = {tuple(r) for r in
           match_over_blocks(art, pats, ["?x", "?y", "?z"]).collect()}
    assert got == {("<ent:special>", "<ent:a0>", "<ent:a3>")}


def test_satellite_prefilter_skips_tautology(spark, artifact):
    """A single-pattern requirement set {q} can only meet its own leaf
    `?x <q> ?y` — the semi-join is a no-op by construction and must be
    SKIPPED (no vertex_preds scan in the plan), results unchanged."""
    triples, art = artifact
    pats = [TriplePattern("?x", "<p:rare>", "?y")]
    plan = _fmt_plan(match_over_blocks(art, pats, ["?x", "?y"]))
    assert "vertex_preds" not in plan
    got = {tuple(r) for r in match_over_blocks(art, pats, ["?x", "?y"]).collect()}
    assert got == {("<ent:special>", "<ent:a0>")}


def test_sig_prefilter_selectivity_gate(spark, artifact):
    """pred_stats-informed signature gating: a var whose every incident
    predicate touches ~all vertices cannot be pruned by its signature —
    the scan is SKIPPED (the round-3 profile measured it as pure cost on
    exactly this shape); a constant neighbor contributes string bits the
    stats cannot model and KEEPS the prefilter. Floor disabled
    (sig_skip_small=0) to isolate the selectivity rules."""
    triples, art = artifact
    chain = [
        TriplePattern("?x", "<p:knows>", "?y"),
        TriplePattern("?y", "<p:knows>", "?z"),
    ]
    plan = _fmt_plan(
        match_over_blocks(art, chain, ["?x", "?y", "?z"], sig_skip_small=0)
    )
    assert "signatures" not in plan
    flat = {tuple(r) for r in match_bgp(triples, chain, ["?x", "?y", "?z"]).collect()}
    got = {tuple(r) for r in
           match_over_blocks(art, chain, ["?x", "?y", "?z"], sig_skip_small=0).collect()}
    assert got == flat and len(flat) > 0

    pats = [
        TriplePattern("?x", "<p:knows>", "<ent:a3>"),
        TriplePattern("?x", "<p:rare>", "?y"),
    ]
    plan2 = _fmt_plan(match_over_blocks(art, pats, ["?x", "?y"], sig_skip_small=0))
    assert "signatures" in plan2
    got2 = {tuple(r) for r in
            match_over_blocks(art, pats, ["?x", "?y"], sig_skip_small=0).collect()}
    assert got2 == {("<ent:special>", "<ent:a0>")}


def test_run_sparql_over_artifact(spark, artifact):
    """SPARQL TEXT answered from the emitted store — the full gqueryD
    lifecycle (Main/gqueryD.cpp:108-265: parse query file, answer out of
    the loaded partitioned store) — result-equal to the flat-view text
    front-end in both leaf-matcher modes, incl. OPTIONAL composition and
    the ASK LIMIT-1 tail."""
    from gstored_spark.plans.sparql import run_sparql, run_sparql_over_artifact

    triples, art = artifact
    text = """
        SELECT ?x ?z ?w WHERE {
            ?x <p:rare> ?y .
            ?x <p:knows> ?z .
            OPTIONAL { ?y <p:rare> ?w }
        } ORDER BY ?x ?z
    """
    flat = [tuple(r) for r in run_sparql(triples, text).collect()]
    for assembled in (False, True):
        got = [
            tuple(r)
            for r in run_sparql_over_artifact(art, text, assembled=assembled).collect()
        ]
        assert got == flat, f"assembled={assembled}"
    assert flat == [("<ent:special>", "<ent:a3>", None)]

    hit = run_sparql_over_artifact(art, "ASK { ?x <p:rare> ?y }").collect()
    assert [r["ask"] for r in hit] == [True]
    assert run_sparql_over_artifact(art, "ASK { ?x <p:rare> <ent:a7> }").count() == 0


def test_ask_over_blocks(spark, artifact):
    triples, art = artifact
    hit = ask_over_blocks(art, [TriplePattern("?x", "<p:rare>", "?y")])
    assert [r["ask"] for r in hit.collect()] == [True]
    miss = ask_over_blocks(art, [TriplePattern("?x", "<p:rare>", "<ent:a7>")])
    assert miss.count() == 0


def test_adaptive_sig_buckets_growth():
    f = B.adaptive_sig_buckets
    t = B.SIG_BUCKET_TARGET_VERTICES
    assert f(100, 4) == B.SIG_BUCKETS  # small data: floor
    assert f(4 * 32 * t, 4) == 32  # 32*target vertices/part -> 32 buckets
    assert f(4 * 128 * t, 4) == 128
    assert f(10**12, 4, ) == B.SIG_BUCKETS_MAX  # clamped
    assert f(0, 0) == B.SIG_BUCKETS  # degenerate inputs


def test_adaptive_buckets_still_prune(spark, tmp_path_factory):
    """A denser layout (tiny per-bucket target forces B > 16) must still
    prune bucket groups and answer correctly — the regression guard for
    growing B with the data (VSTree insert/split, VSTree.cpp:371-440)."""
    from gstored_spark.kg.match import prune_groups, query_var_signatures

    out = str(tmp_path_factory.mktemp("dense"))
    rows = [
        (f"<ent:v{i}>", "<p:knows>", f"<ent:v{(i + 1) % 240}>", True)
        for i in range(240)
    ]
    rows.append(("<ent:v0>", "<p:rare>", "<ent:v5>", True))
    triples, art = _build(spark, rows, out, sig_bucket_target=1)
    assert art.meta["sig_buckets"] > B.SIG_BUCKETS
    pats = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?x", "<p:knows>", "?z"),
    ]
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    qsigs = query_var_signatures(pats, pred_ids)
    level, groups = prune_groups(art, {"x": qsigs["x"]})
    assert level == "bucket"
    kept = {(p, b) for p, bs in groups["x"].items() for b in bs}
    all_pairs = {
        (r["part"], r["bucket"])
        for r in art.bucket_sig.select("part", "bucket").collect()
    }
    assert kept < all_pairs
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x", "?y", "?z"]).collect()}
    got = {tuple(r) for r in match_over_blocks(
        art, pats, ["?x", "?y", "?z"], min_degree=1).collect()}
    assert got == flat


def test_pred_stats_fanout_persisted(spark, artifact):
    triples, art = artifact
    assert {"pid", "n", "n_s", "n_o"} <= set(art.pred_stats.columns)
    pred_ids = {r["term"]: r["id"] for r in art.pred_dict.collect()}
    stats = {r["pid"]: r for r in art.pred_stats.collect()}
    knows = stats[pred_ids["<p:knows>"]]
    assert knows["n"] == 13 and knows["n_s"] >= 12


def test_fanout_cardinality_orders_rare_first():
    """subIDpreID2num analog: with (n, n_s, n_o) stats the greedy order
    seeds with the rare predicate even when a popular predicate carries a
    bound endpoint whose flat-constant estimate would have looked tiny."""
    pats = [
        TriplePattern("?a", "<p:popular>", "?b"),
        TriplePattern("?a", "<p:rare>", "?c"),
    ]
    stats = {"<p:popular>": (10_000, 100, 100), "<p:rare>": (5, 5, 5)}
    order = greedy_order(pats, stats)
    assert order[0] == 1


def test_parsed_query_seeds_with_rare_predicate(spark, artifact):
    """The text/flat path gathers p2num by default: a parsed multi-pattern
    query orders by measured cardinality (run_query_text pred_counts=auto
    -> greedy_order seeds with the rare-predicate pattern)."""
    triples, art = artifact
    counts = predicate_counts(triples)
    pats = [
        TriplePattern("?x", "<p:knows>", "?z"),  # 13 triples
        TriplePattern("?x", "<p:rare>", "?y"),  # 1 triple
    ]
    order = greedy_order(pats, counts)
    assert order[0] == 1
    from gstored_spark.plans.bgp import run_query_text

    got = {
        tuple(r)
        for r in run_query_text(
            triples.select("subj", "pred", "obj"),
            "select ?x ?y ?z where { ?x <p:rare> ?y . ?x <p:knows> ?z }",
        ).collect()
    }
    assert got == {("<ent:special>", "<ent:a0>", "<ent:a3>")}


def test_union_mixed_binding_branches(spark):
    """{?s p ?o . {?s q ?a} UNION {?o r ?a}}: branch 2 binds (o, a) but not
    s — padding its missing s with NULL and joining once on (s, o) would
    drop every branch-2 solution; per-branch joins must keep them."""
    rows = [
        ("s1", "p", "o1"), ("s1", "q", "a1"), ("o1", "r", "a2"),
    ]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    g = GroupPattern(
        patterns=[TriplePattern("?s", "p", "?o")],
        unions=[
            GroupPattern(patterns=[TriplePattern("?s", "q", "?a")]),
            GroupPattern(patterns=[TriplePattern("?o", "r", "?a")]),
        ],
    )
    got = {tuple(r) for r in eval_group(triples, g).select("s", "o", "a").collect()}
    assert got == {("s1", "o1", "a1"), ("s1", "o1", "a2")}


def test_is_star_rejects_center_reuse():
    assert is_star([TriplePattern("?x", "<p>", "?y"), TriplePattern("?x", "<q>", "c")])
    assert not is_star([TriplePattern("?x", "<p>", "?x")])
    assert not is_star([TriplePattern("?x", "?x", "?y")])
    assert not is_star(
        [TriplePattern("?x", "<p>", "?y"), TriplePattern("?x", "<q>", "?x")]
    )


def test_self_loop_star_falls_through_correctly(spark, tmp_path_factory):
    """(?x <p:knows> ?x) must yield exactly the self-loop bindings via the
    general assembly path (the old star short-circuit aliased duplicate
    columns)."""
    rows = _rows() + [("<ent:loop>", "<p:knows>", "<ent:loop>", True)]
    out = str(tmp_path_factory.mktemp("loop"))
    triples, art = _build(spark, rows, out)
    pats = [TriplePattern("?x", "<p:knows>", "?x")]
    flat = {tuple(r) for r in match_bgp(triples, pats, ["?x"]).collect()}
    got = {tuple(r) for r in match_partitioned(art, pats, ["?x"]).collect()}
    assert got == flat == {("<ent:loop>",)}


def test_maybe_broadcast_is_byte_bounded(spark):
    """The explicit broadcast hint bypasses autoBroadcastJoinThreshold, so
    maybe_broadcast must enforce the 64 MB bound itself: 2M wide rows
    (~0.5 GB resident) keep the hint withheld even though the row count is
    under the row guard; a genuinely small side still gets the hint."""
    from gstored_spark.kg.link import maybe_broadcast

    wide = spark.range(2_000_000).select(
        F.col("id"),
        F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("term"),
    )
    assert maybe_broadcast(wide) is wide  # hint withheld: object unchanged
    small = spark.range(1_000).select(F.col("id"), F.lit("t").alias("term"))
    hinted = maybe_broadcast(small)
    assert hinted is not small
    probe = spark.range(1_000).toDF("id")
    plan = hinted.join(probe, "id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_release_checkpoint_frees_blocks(spark):
    """Dataset.unpersist does NOT free localCheckpoint blocks (it only
    uncaches CacheManager entries); release_checkpoint must."""
    from gstored_spark.kg.pipeline import release_checkpoint

    sc = spark.sparkContext

    def n_cached():
        return len(sc._jsc.sc().getRDDStorageInfo())

    base = n_cached()
    ck = spark.range(100_000).selectExpr("id", "id * 2 AS x").localCheckpoint(eager=True)
    assert n_cached() == base + 1
    ck.unpersist()  # documented no-op for checkpoint blocks
    assert n_cached() == base + 1
    release_checkpoint(ck)
    assert n_cached() == base
    release_checkpoint(spark.range(10))  # non-checkpointed: harmless no-op


def test_star_with_partial_partition_map(spark, tmp_path_factory):
    """Artifact built with a PARTIAL partition map: unmapped vertices
    broadcast to every partition and are internal nowhere
    (gloadD.cpp:148-152) — the star path must still return their matches
    exactly once (owner designation instead of the internal filter)."""
    rows = _rows()
    triples0 = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, _, _ = I.build_dictionaries(triples0)
    # map only half the vertices; <ent:special> (a star center) unmapped
    mapped = entity_dict.filter(~F.col("term").isin("<ent:special>", "<ent:a3>"))
    pmap = mapped.select(
        F.col("id").alias("vid"), F.pmod(F.col("id"), F.lit(N_PARTS)).cast("int").alias("part")
    )
    out = str(tmp_path_factory.mktemp("pmap"))
    triples, art = _build(spark, rows, out, partition_map=pmap, hash_routed=False)
    assert art.hash_routed is False
    star = [
        TriplePattern("?x", "<p:rare>", "?y"),
        TriplePattern("?x", "<p:knows>", "?z"),
    ]
    assert is_star(star)
    flat = {tuple(r) for r in match_bgp(triples, star, ["?x", "?y", "?z"]).collect()}
    got = {tuple(r) for r in match_partitioned(art, star, ["?x", "?y", "?z"]).collect()}
    assert got == flat == {("<ent:special>", "<ent:a0>", "<ent:a3>")}


def test_satellite_prefilter_o2p_object_only_var(spark, artifact):
    """The o2p half (Join::filterBySatellites checks BOTH directions,
    Join.cpp:2419-2700): `?s <p:rare> ?x . ?t <p:knows> ?x` — ?x is
    object-ONLY, but both predicates are measurably literal-free
    (pred_stats n_lit = 0), so the in_preds requirement {rare, knows}
    applies and the plan scans vertex_preds."""
    triples, art = artifact
    pats = [
        TriplePattern("?s", "<p:rare>", "?x"),
        TriplePattern("?t", "<p:knows>", "?x"),
    ]
    plan = _fmt_plan(match_over_blocks(art, pats, ["?s", "?t", "?x"]))
    assert "vertex_preds" in plan
    assert "in_preds" in plan
    flat = {tuple(r) for r in
            match_bgp(triples, pats, ["?s", "?t", "?x"]).collect()}
    got = {tuple(r) for r in
           match_over_blocks(art, pats, ["?s", "?t", "?x"]).collect()}
    assert got == flat and len(got) > 0


def test_satellite_o2p_skipped_when_literals_possible(spark, tmp_path_factory):
    """A predicate with literal objects (n_lit > 0) must NOT license
    in_preds pruning for an object-only var — a literal binding has no
    vertex_preds row and would be silently dropped."""
    rows = [
        ("<ent:a>", "<p:name>", '"alice"', False),
        ("<ent:b>", "<p:name>", "<ent:a>", True),
        ("<ent:c>", "<p:likes>", "<ent:a>", True),
        ("<ent:c>", "<p:likes>", '"pizza"', False),
    ]
    out = str(tmp_path_factory.mktemp("o2p_lit"))
    triples, art = _build(spark, rows, out)
    pats = [
        TriplePattern("?s", "<p:name>", "?x"),
        TriplePattern("?t", "<p:likes>", "?x"),
    ]
    plan = _fmt_plan(match_over_blocks(art, pats, ["?s", "?t", "?x"]))
    assert "in_preds" not in plan
    flat = {tuple(r) for r in
            match_bgp(triples, pats, ["?s", "?t", "?x"]).collect()}
    got = {tuple(r) for r in
           match_over_blocks(art, pats, ["?s", "?t", "?x"]).collect()}
    assert got == flat  # {('<ent:b>', '<ent:c>', '<ent:a>')}
    assert len(got) == 1
