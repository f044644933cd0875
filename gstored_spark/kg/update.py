"""§2.10 update operators: batch INSERT DATA / DELETE DATA with
partition-scoped index maintenance.

The reference updates all 12+6 B+-trees plus the VS*-tree per triple
(Database::insert/remove, Database/Database.cpp:3038-3200, insertTriple
2734-2920); free-listed ID allocation reuses holes
(initIDinfo, Database.cpp:89-273). The Spark-native equivalent:

- new terms get IDs appended after the current namespace maximum
  (allocation is append-only here; snapshots make hole-reuse unnecessary),
- the id-triple set is a distinct union minus deletes,
- only the *affected partitions* — owner(subject) plus owner(entity
  object) of every touched triple, exactly the partitions whose adjacency
  the reference would touch — are rebuilt; all other partition blocks are
  carried over unchanged (MERGE-INTO-shaped incremental maintenance).

DECLARED DIVERGENCE — no ID reuse after delete. The reference maintains
free-lists of deleted entity/literal/predicate IDs and re-issues them on
insert (initIDinfo/allocate, Database.cpp:89-273, 275-411) because its ID
space is a mutable resource backing fixed-width B+-tree keys. Here deleted
IDs are simply retired: immutable snapshots mean no tree rewrites, and
correctness never depends on density — only on uniqueness and the
entity/literal range split. The cost is namespace consumption: the entity
namespace holds 1e9 IDs (ids.LITERAL_FIRST_ID), so a workload would need
a cumulative total of 1e9 *distinct entity terms ever inserted* (not live
at once) to exhaust it — at that point the remedy is a compacting rebuild
(build_dictionaries over the live triple set), the same full-rebuild
escape hatch the reference documents for store bloat. Literals get the
same 1e9-wide range; predicates are unbounded longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.kg.blocks import adjacency
from gstored_spark.kg.ids import LITERAL_FIRST_ID, assign_dense_ids
from gstored_spark.kg.partition import internal_vertices, route_triples


def extend_dictionaries(
    new_triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    pred_dict: DataFrame,
):
    """Allocate IDs for unseen terms after each namespace's current max
    (append-only; the reference's free-list reuse is a mutable-store
    concern that snapshots obviate)."""
    spark = new_triples.sparkSession

    def next_id(d: DataFrame, floor: int) -> int:
        row = d.agg(F.max("id").alias("m")).first()
        return (row["m"] + 1) if row["m"] is not None else floor

    new_entities = (
        new_triples.select(F.col("subj").alias("term"))
        .unionAll(new_triples.filter("o_is_entity").select(F.col("obj").alias("term")))
        .distinct()
        .join(entity_dict.select("term"), "term", "left_anti")
    )
    new_literals = (
        new_triples.filter(~F.col("o_is_entity"))
        .select(F.col("obj").alias("term"))
        .distinct()
        .join(literal_dict.select("term"), "term", "left_anti")
    )
    entity_dict2 = entity_dict.unionByName(
        assign_dense_ids(new_entities, "term", next_id(entity_dict, 0))
    )
    literal_dict2 = literal_dict.unionByName(
        assign_dense_ids(new_literals, "term", next_id(literal_dict, LITERAL_FIRST_ID))
    )
    known = {r["term"] for r in pred_dict.collect()}
    new_preds = sorted(
        r["term"]
        for r in new_triples.select(F.col("pred").alias("term")).distinct().collect()
        if r["term"] not in known
    )
    if new_preds:
        base = pred_dict.count()
        pred_dict2 = pred_dict.unionByName(
            spark.createDataFrame(
                [(t, base + i) for i, t in enumerate(new_preds)],
                schema="term string, id long",
            )
        )
    else:
        pred_dict2 = pred_dict
    return entity_dict2, literal_dict2, pred_dict2


def apply_updates(
    id_triples: DataFrame,
    inserts: DataFrame | None,
    deletes: DataFrame | None,
) -> DataFrame:
    """id-level MERGE: distinct(existing ∪ inserts) minus deletes.
    Inputs/outputs: (s, p, o, o_is_entity)."""
    out = id_triples
    cols = ["s", "p", "o", "o_is_entity"]
    if inserts is not None:
        out = out.select(cols).unionByName(inserts.select(cols)).distinct()
    if deletes is not None:
        out = out.join(deletes.select("s", "p", "o"), ["s", "p", "o"], "left_anti")
    return out


def matched_triples(triples_str: DataFrame, patterns: list) -> DataFrame:
    """The triple set a DELETE WHERE BGP matches: evaluate the BGP, then
    materialize each pattern with its bindings substituted back in
    (GeneralEvaluation.cpp:3008-3065 prepareUpdateTriple semantics).
    Input/output columns: (subj, pred, obj)."""
    from gstored_spark.plans.bgp import match_bgp

    bindings = match_bgp(triples_str.select("subj", "pred", "obj"), patterns)
    doomed = None
    for pat in patterns:
        sel = []
        for role, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
            if term.startswith("?"):
                sel.append(F.col(term[1:]).alias(role))
            else:
                sel.append(F.lit(term).alias(role))
        d = bindings.select(*sel)
        doomed = d if doomed is None else doomed.unionByName(d)
    return doomed.distinct()


def instantiate_templates(bindings: DataFrame, templates: list) -> DataFrame:
    """bindings x triple templates -> distinct (subj, pred, obj) rows with
    the bindings substituted into each template's variable slots — the
    prepareUpdateTriple materialization (GeneralEvaluation.cpp:3008-3065)."""
    out = None
    for pat in templates:
        sel = []
        for role, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
            if isinstance(term, str) and term.startswith("?"):
                sel.append(F.col(term[1:]).alias(role))
            else:
                sel.append(F.lit(term).alias(role))
        d = bindings.select(*sel)
        out = d if out is None else out.unionByName(d)
    return out.distinct()


def modify_where_triples(
    triples: DataFrame,
    delete_templates: list,
    insert_templates: list,
    where_group,
) -> DataFrame:
    """String-level SPARQL MODIFY (DELETE {...} INSERT {...} WHERE {...},
    dispatch Database.cpp:619-635, triple materialization
    GeneralEvaluation.cpp:3008-3065): evaluate WHERE once, materialize both
    template sets against its bindings, anti-join the deletes out and merge
    the inserts in. Returns (subj, pred, obj, o_is_entity)."""
    from gstored_spark.plans.bgp import eval_group

    bindings = eval_group(triples.select("subj", "pred", "obj"), where_group)
    out = triples.select(
        "subj", "pred", "obj",
        (~F.col("obj").startswith('"')).alias("o_is_entity")
        if "o_is_entity" not in triples.columns else F.col("o_is_entity"),
    )
    if delete_templates:
        doomed = instantiate_templates(bindings, delete_templates)
        out = out.join(doomed, ["subj", "pred", "obj"], "left_anti")
    if insert_templates:
        ins = instantiate_templates(bindings, insert_templates).withColumn(
            "o_is_entity", ~F.col("obj").startswith('"')
        )
        out = out.unionByName(ins).distinct()
    return out


def delete_where_triples(triples: DataFrame, patterns: list) -> DataFrame:
    """String-level DELETE WHERE: remaining (subj, pred, obj[, ...rest])
    after removing every triple the BGP matches — one anti-join
    (the reference's existence-checked remove, Database.cpp:619-635)."""
    doomed = matched_triples(triples, patterns)
    return triples.join(doomed, ["subj", "pred", "obj"], "left_anti")


def delete_where(
    id_triples: DataFrame,
    patterns: list,
    dicts: tuple[DataFrame, DataFrame, DataFrame],
) -> DataFrame:
    """Id-level DELETE WHERE (GeneralEvaluation.cpp:3008-3065 + the remove
    path Database.cpp:619-635): decode ids -> match BGP -> substitute
    bindings -> anti-join. ``dicts`` = (entity, literal, pred) dictionaries;
    returns the post-delete id-triple set (s, p, o, o_is_entity)."""
    from gstored_spark.kg.ids import decode_ids

    entity_dict, literal_dict, pred_dict = dicts
    term_dict = entity_dict.unionByName(literal_dict)
    t = id_triples
    t = decode_ids(t.withColumnRenamed("s", "sid"), "sid", term_dict, "subj")
    t = decode_ids(t.withColumnRenamed("p", "pid"), "pid", pred_dict, "pred")
    t = decode_ids(t.withColumnRenamed("o", "oid"), "oid", term_dict, "obj")
    triples_str = t.select("subj", "pred", "obj", "sid", "pid", "oid")
    doomed = matched_triples(triples_str, patterns)
    keyed = triples_str.join(doomed, ["subj", "pred", "obj"], "leftsemi")
    del_ids = keyed.select(
        F.col("sid").alias("s"), F.col("pid").alias("p"), F.col("oid").alias("o")
    )
    return apply_updates(id_triples, None, del_ids)


def modify(
    id_triples: DataFrame,
    delete_patterns: list,
    insert_id_triples: DataFrame | None,
    dicts: tuple[DataFrame, DataFrame, DataFrame],
) -> DataFrame:
    """SPARQL UPDATE MODIFY (DELETE ... INSERT ... WHERE,
    GeneralEvaluation.cpp:3008-3065): delete the WHERE-matched triples,
    then merge the inserts — one pass over the store."""
    out = delete_where(id_triples, delete_patterns, dicts)
    return apply_updates(out, insert_id_triples, None)


def affected_partitions(changed: DataFrame, n_parts: int) -> DataFrame:
    """Partitions whose adjacency blocks a change set touches: the
    subject's owner plus (crossing replication!) the entity object's owner
    (gloadD.cpp:127-146 routing)."""
    from gstored_spark.kg.partition import owner

    subj = changed.select(owner(F.col("s"), n_parts).alias("part"))
    obj = changed.filter("o_is_entity").select(owner(F.col("o"), n_parts).alias("part"))
    return subj.unionAll(obj).distinct()


def incremental_adjacency(
    old_adjacency: DataFrame,
    new_id_triples: DataFrame,
    changed: DataFrame,
    n_parts: int,
) -> DataFrame:
    """Rebuild only the affected partitions' adjacency; keep the rest."""
    parts = affected_partitions(changed, n_parts)
    routed = route_triples(new_id_triples, n_parts).join(
        F.broadcast(parts), "part", "leftsemi"
    )
    internal = internal_vertices(routed, n_parts)
    rebuilt = adjacency(routed, internal)
    kept = old_adjacency.join(F.broadcast(parts), "part", "left_anti")
    return kept.unionByName(rebuilt)
