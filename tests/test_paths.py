"""SPARQL 1.1 property paths (plans/paths.py + the parser's path grammar).

The reference's ANTLR grammar has no path production (Parser/SparqlParser.c;
QueryTree.h stores fixed s/p/o triples only) — these are beyond-reference
capability. Ground truth here is a pure-python closure over the same edge
list, so every assertion is independent of the DataFrame implementation.
"""

import pytest

from gstored_spark.plans.paths import (
    Alt,
    Inv,
    Link,
    Repeat,
    Seq,
    closure_pairs,
    eval_path_pattern,
    path_edges,
    reachable_from,
)
from gstored_spark.plans.sparql import parse_sparql, run_sparql

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"),  # chain
    ("d", "b"),                           # cycle b -> c -> d -> b
    ("x", "y"),                           # disconnected component
]


def py_closure(edges):
    pairs = set(edges)
    while True:
        new = {(s, o2) for (s, o) in pairs for (s2, o2) in edges if o == s2}
        if new <= pairs:
            return pairs
        pairs |= new


@pytest.fixture(scope="module")
def triples(spark):
    rows = [(s, "<next>", o) for s, o in EDGES]
    rows += [("a", "<knows>", "x"), ("x", "<in>", "y")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def test_closure_semi_naive_matches_python(spark, triples):
    edges = path_edges(triples, Link("<next>"))
    got = set(map(tuple, closure_pairs(edges).collect()))
    assert got == py_closure(EDGES)


def test_closure_cycles_terminate_and_self_pairs(spark, triples):
    # every node on the b->c->d cycle reaches itself via +
    got = set(map(tuple, path_edges(triples, Repeat(Link("<next>"), "+")).collect()))
    for n in ("b", "c", "d"):
        assert (n, n) in got
    assert ("a", "a") not in got


def test_star_includes_zero_length_for_all_graph_nodes(spark, triples):
    got = set(map(tuple, path_edges(triples, Repeat(Link("<next>"), "*")).collect()))
    # zero-length pairs for EVERY term in the graph, even nodes with no
    # <next> edge (y only appears as an object of <in>)
    for n in ("a", "b", "c", "d", "x", "y"):
        assert (n, n) in got
    assert got == py_closure(EDGES) | {(n, n) for n in "abcdxy"}


def test_seq_alt_inv_algebra(spark, triples):
    seq = _pairs(path_edges(triples, Seq((Link("<knows>"), Link("<in>")))))
    assert seq == [("a", "y")]
    inv = _pairs(path_edges(triples, Inv(Link("<knows>"))))
    assert inv == [("x", "a")]
    alt = _pairs(path_edges(triples, Alt((Link("<knows>"), Link("<in>")))))
    assert alt == [("a", "x"), ("x", "y")]


def test_bound_endpoint_seeded_bfs_equals_full_closure(spark, triples):
    # the fast path (reachable_from) must agree with filtering the closure
    full = {o for (s, o) in py_closure(EDGES) if s == "a"}
    got = {
        r[0]
        for r in eval_path_pattern(
            triples, "a", Repeat(Link("<next>"), "+"), "?o"
        ).collect()
    }
    assert got == full
    # bound OBJECT side: reverse BFS
    full_rev = {s for (s, o) in py_closure(EDGES) if o == "d"}
    got_rev = {
        r[0]
        for r in eval_path_pattern(
            triples, "?s", Repeat(Link("<next>"), "+"), "d"
        ).collect()
    }
    assert got_rev == full_rev


def test_star_constant_matches_itself_even_off_graph(spark, triples):
    # spec: zero-length path binds the var to the constant itself, graph
    # membership not required
    got = {
        r[0]
        for r in eval_path_pattern(
            triples, "ghost", Repeat(Link("<next>"), "*"), "?o"
        ).collect()
    }
    assert got == {"ghost"}


def test_repeated_var_path_pattern(spark, triples):
    got = {
        r[0]
        for r in eval_path_pattern(
            triples, "?x", Repeat(Link("<next>"), "+"), "?x"
        ).collect()
    }
    assert got == {"b", "c", "d"}


def test_parser_precedence_and_shapes(spark):
    q = parse_sparql("SELECT ?a ?b WHERE { ?a <p>/<q>|^<r>+ ?b }")
    (s, path, o), = q.group.path_patterns
    # '|' binds loosest, '/' tighter, postfix tightest, '^' on the primary
    assert path == Alt((Seq((Link("<p>"), Link("<q>"))), Inv(Repeat(Link("<r>"), "+"))))
    q2 = parse_sparql("SELECT * WHERE { ?a (<p>|<q>)+ ?b }")
    (_, path2, _), = q2.group.path_patterns
    assert path2 == Repeat(Alt((Link("<p>"), Link("<q>"))), "+")
    # a plain IRI predicate stays an ordinary TriplePattern (leaf BGP path)
    q3 = parse_sparql("SELECT * WHERE { ?a <p> ?b }")
    assert q3.group.patterns and not q3.group.path_patterns


def test_text_query_with_path_joins_bgp(spark, triples):
    # path pattern joins an ordinary BGP pattern on the shared var
    out = run_sparql(
        triples,
        "SELECT ?s ?o WHERE { ?s <knows> ?x . ?x <in>* ?o }",
    )
    assert _pairs(out) == [("a", "x"), ("a", "y")]


def test_path_over_emitted_artifact(spark, tmp_path_factory):
    """run_sparql_over_artifact builds the decoded triple view for path
    leaves while ordinary BGP leaves still use the store-backed matcher."""
    from gstored_spark.kg import blocks as B
    from gstored_spark.kg import ids as I
    from gstored_spark.kg import partition as P
    from gstored_spark.kg.pipeline import PipelineResult
    from gstored_spark.plans.sparql import run_sparql_over_artifact

    rows = [(s, "<next>", o, True) for s, o in EDGES]
    rows += [("a", "<knows>", "x", True)]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, 2)
    internal = P.internal_vertices(routed, 2)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, pred_dict, entity_dict)
    part_sig = B.partition_signature(B.partitioned_signatures(sigs, internal))
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    out = str(tmp_path_factory.mktemp("path_artifact"))
    B.write_artifact(res, out)
    art = B.GraphArtifact(spark, out)

    got = run_sparql_over_artifact(
        art, "SELECT ?s ?o WHERE { ?s <knows> ?x . ?x <next>+ ?o }"
    )
    want = sorted(("a", o) for (s, o) in py_closure(EDGES) if s == "x")
    assert _pairs(got) == want  # x has no <next> edge -> empty is fine too

    # DESCRIBE over the store: id-level semi-joins, result-only decode —
    # must equal the flat-view description of the same resource
    store_desc = run_sparql_over_artifact(art, 'DESCRIBE "b"')
    flat_desc = run_sparql(
        triples.select("subj", "pred", "obj"), 'DESCRIBE "b"'
    )
    assert {tuple(r) for r in store_desc.collect()} == {
        tuple(r) for r in flat_desc.collect()
    } and store_desc.count() == 3  # a->b, b->c, d->b


def test_negated_property_set(spark, triples):
    from gstored_spark.plans.paths import Neg

    # forward-only: every edge whose predicate is not <next>
    got = _pairs(path_edges(triples, Neg(("<next>",), ())))
    assert got == [("a", "x"), ("x", "y")]
    # mixed: pred not <knows> forward, unioned with reversed pred not <in>
    got2 = set(
        map(tuple, path_edges(triples, Neg(("<knows>",), ("<in>",))).collect())
    )
    fwd = {(s, o) for s, o in EDGES} | {("x", "y")}
    rev = {(o, s) for s, o in EDGES} | {("x", "a")}
    assert got2 == fwd | rev


def test_negated_property_set_from_text(spark, triples):
    got = _pairs(
        run_sparql(triples, "SELECT ?s ?o WHERE { ?s !(<next>|<in>) ?o }")
    )
    assert got == [("a", "x")]
    inv_only = _pairs(
        run_sparql(triples, "SELECT ?s ?o WHERE { ?s !(^<next>|^<knows>) ?o }")
    )
    assert inv_only == [("y", "x")]


def test_squaring_closure_equals_semi_naive(spark, triples):
    from gstored_spark.plans.paths import closure_pairs_squaring

    edges = path_edges(triples, Link("<next>"))
    got = set(map(tuple, closure_pairs_squaring(edges).collect()))
    assert got == py_closure(EDGES)
    # a deep chain converges in O(log n) doubling rounds
    chain = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(40)], "s string, o string"
    )
    sq = set(map(tuple, closure_pairs_squaring(chain, max_rounds=8).collect()))
    assert len(sq) == 40 * 41 // 2


def test_store_path_link_scans_pbucket_only(spark, tmp_path_factory):
    """A store-backed path Link must scan its pbucket= directory with the
    pushed p filter (predicate-first probe), never the adjacency store, and
    the closure must run at id level (long join keys), decoding results
    only."""
    import re

    from gstored_spark.kg import blocks as B
    from gstored_spark.kg import ids as I
    from gstored_spark.kg import partition as P
    from gstored_spark.kg.match import path_pattern_over_blocks
    from gstored_spark.kg.pipeline import PipelineResult

    rows = [(s, "<next>", o, True) for s, o in EDGES]
    rows += [("a", "<knows>", "x", True)]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, 2)
    internal = P.internal_vertices(routed, 2)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, pred_dict, entity_dict)
    part_sig = B.partition_signature(B.partitioned_signatures(sigs, internal))
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    out_dir = str(tmp_path_factory.mktemp("path_pbucket"))
    B.write_artifact(res, out_dir)
    art = B.GraphArtifact(spark, out_dir)

    # a Seq keeps a lazy plan (closures checkpoint eagerly, hiding the
    # scan), so the access path is assertable here; the id-level closure
    # correctness over the same store is covered by
    # test_path_over_emitted_artifact
    out = path_pattern_over_blocks(
        art, "?s", Seq((Link("<knows>"), Link("<next>"))), "?o"
    )
    jqe = out._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jqe.explainString(mode)
    assert "triples_by_pred" in plan
    assert "/adjacency" not in plan
    assert re.search(r"PartitionFilters: \[[^\]]*pbucket", plan), plan[:2000]
    got = {(r["s"], r["o"]) for r in out.collect()}
    assert got == {("a", "y")}  # a -knows-> x -next-> y
    plus = path_pattern_over_blocks(art, "a", Repeat(Link("<next>"), "+"), "?o")
    assert {r["o"] for r in plus.collect()} == {
        o for (s, o) in py_closure(EDGES) if s == "a"
    }


def test_store_path_distinct_unknown_constants_no_false_selfmatch(
    spark, tmp_path_factory
):
    """Two DISTINCT off-dictionary constants must encode to distinct
    sentinels: ASK-shape `<unkA> <next>* <unkB>` has no solution, while
    `<unkA> <next>* <unkA>` keeps the spec's zero-length self-match."""
    from gstored_spark.kg import blocks as B
    from gstored_spark.kg import ids as I
    from gstored_spark.kg import partition as P
    from gstored_spark.kg.match import path_pattern_over_blocks
    from gstored_spark.kg.pipeline import PipelineResult

    rows = [(s, "<next>", o, True) for s, o in EDGES]
    triples = spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, 2)
    internal = P.internal_vertices(routed, 2)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, pred_dict, entity_dict)
    part_sig = B.partition_signature(B.partitioned_signatures(sigs, internal))
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    out_dir = str(tmp_path_factory.mktemp("path_sentinels"))
    B.write_artifact(res, out_dir)
    art = B.GraphArtifact(spark, out_dir)

    star = Repeat(Link("<next>"), "*")
    assert path_pattern_over_blocks(art, "unkA", star, "unkB").count() == 0
    assert path_pattern_over_blocks(art, "unkA", star, "unkA").count() == 1
