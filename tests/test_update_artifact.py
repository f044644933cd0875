"""In-place incremental artifact maintenance (kg.update.update_artifact):
after an INSERT+DELETE batch, every patched table must equal a FULL
write_artifact rebuild of the merged triple set over the same (extended)
dictionaries — the dynamic-partition-overwrite analog of the reference
updating its B+-trees and VS*-tree in place (Database.cpp:3038-3200)."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg import blocks as B
from gstored_spark.kg import ids as I
from gstored_spark.kg import partition as P
from gstored_spark.kg.pipeline import PipelineResult
from gstored_spark.kg.update import update_artifact
from gstored_spark.plans.bgp import TriplePattern

N_PARTS = 4

BASE_ROWS = [
    (f"<ent:a{i}>", "<p:knows>", f"<ent:a{(i + 1) % 12}>", True) for i in range(12)
] + [
    ("<ent:special>", "<p:rare>", "<ent:a0>", True),
    ("<ent:special>", "<p:knows>", "<ent:a3>", True),
    ("<ent:special>", "<p:name>", '"special one"@en', False),
]

INSERTS = [
    ("<ent:new1>", "<p:knows>", "<ent:a0>", True),     # new entity
    ("<ent:a0>", "<p:likes>", '"pizza"', False),       # new predicate + literal
    ("<ent:a1>", "<p:knows>", "<ent:a2>", True),       # duplicate: no-op
]

DELETES = [
    ("<ent:special>", "<p:rare>", "<ent:a0>"),         # existing
    ("<ent:a5>", "<p:rare>", "<ent:a6>"),              # nonexistent: no-op
]


def _write_full(spark, triples, entity_dict, literal_dict, pred_dict, out):
    id_triples = I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    routed = P.route_triples(id_triples, N_PARTS)
    internal = P.internal_vertices(routed, N_PARTS)
    adj = B.adjacency(routed, internal)
    sigs = B.vertex_signatures(triples, pred_dict, entity_dict)
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs,
        part_sig=B.partition_signature(B.partitioned_signatures(sigs, internal)),
    )
    B.write_artifact(res, out)
    return B.GraphArtifact(spark, out)


@pytest.fixture(scope="module")
def updated_and_rebuilt(spark, tmp_path_factory):
    base = spark.createDataFrame(BASE_ROWS, ["subj", "pred", "obj", "o_is_entity"])
    e0, l0, p0 = I.build_dictionaries(base)
    a_dir = str(tmp_path_factory.mktemp("art_inc"))
    _write_full(spark, base, e0, l0, p0, a_dir)

    ins = spark.createDataFrame(INSERTS, ["subj", "pred", "obj", "o_is_entity"])
    dele = spark.createDataFrame(DELETES, ["subj", "pred", "obj"])
    art2 = update_artifact(spark, a_dir, inserts=ins, deletes=dele)

    # expected: FULL rebuild of the merged set over art2's (appended)
    # dictionaries, so ids line up and tables compare directly
    merged_rows = [
        r for r in BASE_ROWS if (r[0], r[1], r[2]) not in set(DELETES)
    ] + [r for r in INSERTS if r not in BASE_ROWS]
    merged = spark.createDataFrame(merged_rows, ["subj", "pred", "obj", "o_is_entity"])
    b_dir = str(tmp_path_factory.mktemp("art_full"))
    ref = _write_full(
        spark, merged, art2.entity_dict, art2.literal_dict, art2.pred_dict, b_dir
    )
    return art2, ref


def _adj_map(art):
    return {
        (r["part"], r["v"]): (r["is_internal"], tuple(map(tuple, r["out"])),
                              tuple(map(tuple, r["in"])))
        for r in art.adjacency.collect()
    }


def test_adjacency_patched_dirs_equal_rebuild(updated_and_rebuilt):
    art2, ref = updated_and_rebuilt
    assert _adj_map(art2) == _adj_map(ref)


def test_triples_by_pred_equal_rebuild(updated_and_rebuilt):
    art2, ref = updated_and_rebuilt

    def bag(a):
        return sorted(
            (r["pbucket"], r["s"], r["p"], r["o"], r["o_is_entity"])
            for r in a.triples_by_pred.collect()
        )

    assert bag(art2) == bag(ref)


def test_vertex_preds_equal_rebuild(updated_and_rebuilt):
    art2, ref = updated_and_rebuilt

    def vp(a):
        return {
            (r["part"], r["v"]): (tuple(sorted(r["out_preds"])),
                                  tuple(sorted(r["in_preds"])))
            for r in a.vertex_preds.collect()
        }

    assert vp(art2) == vp(ref)


def test_signatures_and_or_trees_equal_rebuild(updated_and_rebuilt):
    art2, ref = updated_and_rebuilt

    def sigs(a):
        return {
            (r["part"], r["bucket"], r["v"]): tuple(r["sig"])
            for r in a.signatures.collect()
        }

    assert sigs(art2) == sigs(ref)

    def bsig(a):
        return {(r["part"], r["bucket"]): tuple(r["sig"])
                for r in a.bucket_sig.collect()}

    assert bsig(art2) == bsig(ref)

    def psig(a):
        return {r["part"]: tuple(r["sig"]) for r in a.part_sig.collect()}

    assert psig(art2) == psig(ref)


def test_stats_meta_and_queries_after_update(updated_and_rebuilt):
    art2, ref = updated_and_rebuilt
    n2 = {r["pid"]: r["n"] for r in art2.pred_stats.collect()}
    nr = {r["pid"]: r["n"] for r in ref.pred_stats.collect()}
    assert n2 == nr
    assert art2.meta["n_vertices"] == ref.meta["n_vertices"]

    from gstored_spark.kg.match import match_over_blocks

    got = {
        tuple(r) for r in match_over_blocks(
            art2, [TriplePattern("?x", "<p:likes>", "?y")], ["?x", "?y"],
            min_degree=1,
        ).collect()
    }
    assert got == {("<ent:a0>", '"pizza"')}
    gone = match_over_blocks(
        art2, [TriplePattern("?x", "<p:rare>", "?y")], ["?x", "?y"], min_degree=1
    ).collect()
    assert gone == []


def test_update_artifact_noop_and_guards(spark, tmp_path_factory, updated_and_rebuilt):
    art2, _ = updated_and_rebuilt
    # no changes -> same handle state, nothing rewritten
    before = art2.adjacency.count()
    art3 = update_artifact(spark, art2.dir)
    assert art3.adjacency.count() == before


def test_streaming_artifact_maintenance(spark, tmp_path_factory):
    """Change batches dropped into a directory stream through foreachBatch
    into update_artifact; replaying the same batch is a no-op (idempotent
    => effectively exactly-once against the store)."""
    from gstored_spark.kg.match import match_over_blocks
    from gstored_spark.streaming.ingest import (
        TRIPLE_CHANGE_SCHEMA, start_artifact_maintenance,
    )

    base = spark.createDataFrame(BASE_ROWS, ["subj", "pred", "obj", "o_is_entity"])
    e0, l0, p0 = I.build_dictionaries(base)
    art_dir = str(tmp_path_factory.mktemp("art_stream"))
    _write_full(spark, base, e0, l0, p0, art_dir)

    in_dir = str(tmp_path_factory.mktemp("changes"))
    ck_dir = str(tmp_path_factory.mktemp("ckpt"))
    batch = [
        ("<ent:new1>", "<p:knows>", "<ent:a0>", True, "insert"),
        ("<ent:a0>", "<p:likes>", '"pizza"', False, "insert"),
        ("<ent:special>", "<p:rare>", "<ent:a0>", None, "delete"),
    ]
    spark.createDataFrame(
        batch, TRIPLE_CHANGE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)

    q = start_artifact_maintenance(spark, art_dir, in_dir, ck_dir)
    q.awaitTermination(120)

    art = B.GraphArtifact(spark, art_dir)
    got = {
        tuple(r) for r in match_over_blocks(
            art, [TriplePattern("?x", "<p:likes>", "?y")], ["?x", "?y"],
            min_degree=1,
        ).collect()
    }
    assert got == {("<ent:a0>", '"pizza"')}
    assert match_over_blocks(
        art, [TriplePattern("?x", "<p:rare>", "?y")], ["?x", "?y"], min_degree=1
    ).collect() == []
    n_before = art.triples_by_pred.count()

    # replay the identical batch from a FRESH checkpoint: every row is a
    # store-level no-op (insert dedupe + existence-checked delete)
    ck2 = str(tmp_path_factory.mktemp("ckpt2"))
    q2 = start_artifact_maintenance(spark, art_dir, in_dir, ck2)
    q2.awaitTermination(120)
    art2 = B.GraphArtifact(spark, art_dir)
    assert art2.triples_by_pred.count() == n_before


def test_compact_artifact(spark, updated_and_rebuilt, tmp_path_factory):
    """Compaction (VS*-tree rebalance / bulk-rebuild analog): the updated
    store rewritten to a fresh layout is LOGICALLY identical to a full
    rebuild, collapses each adjacency part= dir to one file, re-adapts the
    signature-bucket count to the current vertex count, and answers the
    same queries."""
    import glob

    from gstored_spark.kg.match import match_over_blocks

    art2, ref = updated_and_rebuilt
    c_dir = str(tmp_path_factory.mktemp("art_compact"))
    art3 = B.compact_artifact(art2, c_dir)

    assert _adj_map(art3) == _adj_map(ref)
    sig3 = {(r["part"], r["bucket"], r["v"]): tuple(r["sig"])
            for r in art3.signatures.collect()}
    sigr = {(r["part"], r["bucket"], r["v"]): tuple(r["sig"])
            for r in ref.signatures.collect()}
    assert sig3 == sigr
    tb3 = sorted((r["pbucket"], r["s"], r["p"], r["o"])
                 for r in art3.triples_by_pred.collect())
    tbr = sorted((r["pbucket"], r["s"], r["p"], r["o"])
                 for r in ref.triples_by_pred.collect())
    assert tb3 == tbr

    # one writer per part= dir: exactly one parquet file each
    for d in glob.glob(f"{c_dir}/adjacency/part=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1, d
    # bucket count re-derived from the CURRENT counts
    assert art3.meta["sig_buckets"] == B.adaptive_sig_buckets(
        art3.meta["n_vertices"], art3.meta["n_parts"]
    )
    assert art3.meta["n_vertices"] == ref.meta["n_vertices"]

    got = {tuple(r) for r in match_over_blocks(
        art3, [TriplePattern("?x", "<p:likes>", "?y")], ["?x", "?y"],
        min_degree=1).collect()}
    assert got == {("<ent:a0>", '"pizza"')}
    assert match_over_blocks(
        art3, [TriplePattern("?x", "<p:rare>", "?y")], ["?x"], min_degree=1
    ).count() == 0

    # guard: refuse in-place self-overwrite
    import pytest as _pytest
    with _pytest.raises(ValueError):
        B.compact_artifact(art2, art2.dir)
