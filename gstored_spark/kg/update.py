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

ID free lists (initIDinfo/allocate, Database.cpp:89-273, 275-411): the
reference re-issues deleted entity/literal/predicate IDs on insert. Here
the same contract is split across two operations, matching where the
reference actually does the work:

- ``vacuum_artifact`` is the ``initIDinfo`` analog — the reference
  REBUILDS its free-ID info by scanning the store at load time
  (Database.cpp:89-273); vacuum scans the logical triple bag once, drops
  dictionary rows whose term is no longer referenced, and persists the
  freed IDs to a ``free_ids/`` table.
- ``update_artifact`` / ``dictionary_deltas`` are the ``allocate`` analog:
  new terms draw from the persisted free lists first (lexicographically
  smallest term takes the numerically smallest hole, deterministic at any
  parallelism) and only then extend past the namespace max.

DECLARED DIVERGENCE — deletes do not free IDs *inline*. The reference
decrements per-term refcounts on every remove and frees at zero because
its ID space backs fixed-width mutable B+-tree keys; with immutable
snapshots, a dead dictionary row is harmless until the next vacuum, so
hole discovery is deferred to the scan the reference performs at load
time anyway. Between vacuums the cost is namespace consumption, bounded
by the 1e9-wide entity/literal ranges (ids.LITERAL_FIRST_ID).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.kg.blocks import adjacency
from gstored_spark.kg.ids import LITERAL_FIRST_ID, assign_dense_ids
from gstored_spark.kg.partition import internal_vertices, route_triples


def assign_ids_reusing(
    new_terms: DataFrame, col: str, free_ids: DataFrame | None, next_append: int
) -> DataFrame:
    """Deterministic delta allocation with hole reuse (allocate,
    Database.cpp:275-411): the lexicographically smallest new terms take
    the numerically smallest free IDs; the remainder extends past the
    namespace max. Both ranks are global-sort positions (the
    assign_dense_ids machinery), so the assignment is identical at any
    parallelism. ``free_ids``: one ``id`` column, or None/empty."""
    if free_ids is None:
        return assign_dense_ids(new_terms, col, next_append)
    term_rank = assign_dense_ids(new_terms, col).withColumnRenamed("id", "rank")
    free_rank = assign_dense_ids(
        free_ids.select(F.col("id").alias("fid")), "fid", dtype="long"
    ).withColumnRenamed("id", "rank")
    n_free = free_rank.count()  # cheap: assign_dense_ids checkpoints
    if n_free:
        # holes can sit past the vacuumed dictionary's max (the dead terms
        # WERE the tail) — appended ids must clear both
        free_max = free_rank.agg(F.max("fid")).first()[0]
        next_append = max(next_append, free_max + 1)
    reused = term_rank.join(free_rank, "rank").select(
        col, F.col("fid").alias("id")
    )
    appended = term_rank.join(free_rank, "rank", "left_anti").select(
        col, (F.col("rank") - F.lit(n_free) + F.lit(next_append)).alias("id")
    )
    return reused.unionByName(appended)


def dictionary_deltas(
    new_triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    pred_dict: DataFrame,
    free_entity_ids: DataFrame | None = None,
    free_literal_ids: DataFrame | None = None,
    free_pred_ids: list[int] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The NEW dictionary rows a triple batch requires — unseen terms with
    IDs drawn from the namespace's free list first (holes left by a prior
    vacuum; reference ``allocate``, Database.cpp:275-411), then allocated
    after the current max. Returned separately so artifact maintenance can
    APPEND just these rows to the on-disk dictionaries."""
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
    d_entity = assign_ids_reusing(
        new_entities, "term", free_entity_ids, next_id(entity_dict, 0)
    )
    d_literal = assign_ids_reusing(
        new_literals, "term", free_literal_ids, next_id(literal_dict, LITERAL_FIRST_ID)
    )
    rows = pred_dict.collect()
    known = {r["term"] for r in rows}
    new_preds = sorted(
        r["term"]
        for r in new_triples.select(F.col("pred").alias("term")).distinct().collect()
        if r["term"] not in known
    )
    holes = sorted(free_pred_ids or [])
    # appended ids must clear live ids AND holes (see assign_ids_reusing)
    base = max([r["id"] for r in rows] + holes, default=-1) + 1 if new_preds else 0
    pred_ids = holes[: len(new_preds)] + [
        base + i for i in range(len(new_preds) - len(holes))
    ]
    d_pred = spark.createDataFrame(
        list(zip(new_preds, pred_ids)), schema="term string, id long"
    )
    return d_entity, d_literal, d_pred


def extend_dictionaries(
    new_triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    pred_dict: DataFrame,
):
    """Dictionaries extended with IDs for unseen terms (dictionary_deltas
    unioned onto the existing tables)."""
    d_e, d_l, d_p = dictionary_deltas(new_triples, entity_dict, literal_dict, pred_dict)
    return (
        entity_dict.unionByName(d_e),
        literal_dict.unionByName(d_l),
        pred_dict.unionByName(d_p),
    )


def vacuum_dictionaries(
    id_triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    pred_dict: DataFrame,
):
    """Drop dictionary rows whose ID no longer appears in any triple and
    return the freed IDs — the reference's refcount-reaches-zero removal
    (Database.cpp:275-411) done as one set-difference over the live triple
    bag, the same scan ``initIDinfo`` performs to rebuild free-ID info at
    load time (Database.cpp:89-273).

    Returns (entity_dict, literal_dict, pred_dict, free_entity_ids,
    free_literal_ids, free_pred_ids) — free_* have one ``id`` column.
    Invariant afterwards: free IDs are bound to NO term, so reusing one
    can never alias two terms."""
    used = (
        id_triples.select(F.col("s").alias("id"))
        .unionAll(id_triples.select(F.col("o").alias("id")))
        .distinct()
    )
    used_p = id_triples.select(F.col("p").alias("id")).distinct()
    out = []
    for d, u in ((entity_dict, used), (literal_dict, used), (pred_dict, used_p)):
        out.append(
            (d.join(u, "id", "leftsemi"), d.select("id").join(u, "id", "left_anti"))
        )
    (e2, fe), (l2, fl), (p2, fp) = out
    return e2, l2, p2, fe, fl, fp


def vacuum_artifact(spark, art_dir: str):
    """``initIDinfo`` for the emitted store (Database.cpp:89-273): scan the
    logical triple bag once, drop dead dictionary rows, and persist the
    freed IDs to ``free_ids/`` (ns 0=entity, 1=literal, 2=predicate) for
    ``update_artifact`` to re-issue on subsequent inserts. Rewrites only
    the three dictionary dirs + free_ids — adjacency/signature tables
    reference live IDs only, so they are untouched. Returns a fresh
    GraphArtifact."""
    from gstored_spark.kg.blocks import GraphArtifact

    art = GraphArtifact(spark, art_dir)
    bag = (
        art.triples_by_pred
        if art.triples_by_pred is not None
        else art.adjacency.filter("is_internal").select(
            F.col("v").alias("s"), F.explode("out").alias("e")
        ).select("s", F.col("e.p").alias("p"), F.col("e.o").alias("o"))
    )
    e2, l2, p2, fe, fl, fp = vacuum_dictionaries(
        bag.select("s", "p", "o"), art.entity_dict, art.literal_dict, art.pred_dict
    )
    free = (
        fe.withColumn("ns", F.lit(0))
        .unionByName(fl.withColumn("ns", F.lit(1)))
        .unionByName(fp.withColumn("ns", F.lit(2)))
    )
    # materialize everything BEFORE overwriting the dirs being read
    e2, l2, p2, free = (d.localCheckpoint() for d in (e2, l2, p2, free))
    for d, name in ((e2, "entity_dict"), (l2, "literal_dict"), (p2, "pred_dict")):
        d.write.mode("overwrite").parquet(f"{art_dir}/{name}")
    free.write.mode("overwrite").parquet(f"{art_dir}/free_ids")
    return GraphArtifact(spark, art_dir)


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


def update_artifact(
    spark,
    art_dir: str,
    inserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
):
    """In-place incremental maintenance of an EMITTED artifact — the Spark
    analog of the reference updating its 12+6 B+-trees and VS*-tree per
    batch (Database::insert/remove, Database.cpp:3038-3200): every derived
    table is patched via DYNAMIC PARTITION OVERWRITE of exactly the
    directories the change set touches. NO step scans the whole store —
    every read is directory-pruned to affected ``part=`` / ``pbucket=`` /
    ``(part=, bucket=)`` dirs, so cost is O(affected dirs + change set),
    the same contract as the reference touching only the tree paths of the
    changed keys.

    ``inserts``: string triples (subj, pred, obj, o_is_entity);
    ``deletes``: string triples (subj, pred, obj) — unknown terms match
    nothing, exactly like the reference's existence-checked remove.

    Per table:
      - dictionaries: the new rows APPEND (dictionary_deltas);
      - adjacency/: each affected partition's local triple bag is
        RECONSTITUTED from its own out-lists (explode is exact: a
        partition's routed set == union of its vertices' out-edges), the
        change applied, blocks regrouped — affected ``part=`` dirs only;
      - triples_by_pred/: affected ``pbucket=`` dirs re-merged;
      - vertex_preds/: derived from the rebuilt adjacency (same dirs);
      - signatures/: changed-endpoint vertices get their signatures
        recomputed from their FULL new neighborhoods (OR is not
        invertible, so deletes recompute rather than clear bits) — read
        from the rebuilt owner partitions, never a full scan; their
        ``part=/bucket=`` dirs are rewritten with unaffected co-resident
        rows carried over;
      - bucket_sig / part_sig / pred_stats / meta: small tables (<= parts
        x buckets rows / one row per predicate) — merged and rewritten.

    Requires a hash-routed, format>=3 artifact (raises otherwise). NOT
    atomic across tables — a production deployment wraps this in a
    table-format snapshot commit (Iceberg), the same way the pipeline's
    StageStore snapshots stages; the reference's in-place tree updates are
    equally non-atomic. All rebuilt data is materialized (eager
    localCheckpoint) BEFORE the first overwrite, so no write clobbers a
    directory a pending read still needs. Returns a fresh GraphArtifact."""
    from gstored_spark.kg.blocks import (
        GraphArtifact,
        predicate_bucketed_triples,
        predicate_stats,
        sig_or,
        vertex_predicate_sets,
        vertex_signatures_from_ids,
    )
    from gstored_spark.kg.ids import encode_triples
    from gstored_spark.kg.partition import owner

    art = GraphArtifact(spark, art_dir)
    if not art.hash_routed:
        raise ValueError(
            "update_artifact requires a hash-routed artifact: with a partial "
            "partition map, changed vertices have no unique owner partition"
        )
    if art.meta.get("format", 0) < 3 or art.triples_by_pred is None:
        raise ValueError(
            "update_artifact requires a format>=3 artifact (vertex_preds "
            "partitioned by part, triples_by_pred present) — rewrite with "
            "write_artifact first"
        )
    n_parts = int(art.meta["n_parts"])
    pred_k = art.pred_buckets
    sig_b = int(art.meta["sig_buckets"])
    tbp = art.triples_by_pred

    # -- dictionary deltas (appended later; used for encoding now) --------
    # new terms draw from the free lists a prior vacuum persisted
    # (allocate, Database.cpp:275-411) before extending past the max
    empty = spark.createDataFrame([], "term string, id long")
    if inserts is not None:
        free = art.free_ids
        d_e, d_l, d_p = dictionary_deltas(
            inserts, art.entity_dict, art.literal_dict, art.pred_dict,
            free_entity_ids=free.filter("ns = 0") if free is not None else None,
            free_literal_ids=free.filter("ns = 1") if free is not None else None,
            free_pred_ids=[r["id"] for r in free.filter("ns = 2").collect()]
            if free is not None else None,
        )
        d_e, d_l, d_p = (d.localCheckpoint() for d in (d_e, d_l, d_p))
    else:
        d_e = d_l = d_p = empty
    entity2 = art.entity_dict.unionByName(d_e)
    literal2 = art.literal_dict.unionByName(d_l)
    pred2 = art.pred_dict.unionByName(d_p)

    del_ids = None
    if deletes is not None:
        dd = deletes.withColumn("o_is_entity", F.lit(True))  # recomputed below
        del_ids = (
            encode_triples(dd, art.entity_dict, art.literal_dict, art.pred_dict)
            .withColumn("o_is_entity", F.col("o") < LITERAL_FIRST_ID)
            .localCheckpoint()
        )
    ins_ids = None
    if inserts is not None:
        raw = encode_triples(inserts, entity2, literal2, pred2).dropDuplicates(
            ["s", "p", "o"]
        )
        # dedupe against the EXISTING bag, scoped to the inserts' own
        # pbucket dirs (re-inserting a present triple is a no-op)
        ins_pb = [
            r["pb"] for r in raw.select(
                F.pmod(F.col("p"), F.lit(pred_k)).cast("int").alias("pb")
            ).distinct().collect()
        ]
        scope = tbp.filter(F.col("pbucket").isin(ins_pb)).select("s", "p", "o")
        ins_ids = raw.join(scope, ["s", "p", "o"], "left_anti").localCheckpoint()
    changed = None
    for c in (ins_ids, del_ids):
        if c is not None:
            changed = c if changed is None else changed.unionByName(c)
    if changed is None:
        return art  # nothing to do

    def _apply(bag: DataFrame) -> DataFrame:
        """change applied to a (s,p,o,o_is_entity) slice; del_ids/ins_ids
        are change-sized, so the anti-join broadcasts."""
        out = bag
        if del_ids is not None:
            out = out.join(
                F.broadcast(del_ids.select("s", "p", "o")), ["s", "p", "o"],
                "left_anti",
            )
        return out

    # -- 1. adjacency: rebuild affected part= dirs from their own blocks --
    parts = affected_partitions(changed, n_parts).localCheckpoint()
    part_list = sorted(r["part"] for r in parts.collect())
    adj_aff = art.adjacency.filter(F.col("part").isin(part_list))
    old_nv_aff = adj_aff.filter("is_internal").count()
    # a partition's routed triple set == explode of its out-lists (owner
    # AND crossing rows both land in the subject row's out list there)
    routed_old = adj_aff.select(
        "part", F.col("v").alias("s"), F.explode("out").alias("e")
    ).select(
        "part", "s", F.col("e.p").alias("p"), F.col("e.o").alias("o"),
        (F.col("e.o") < LITERAL_FIRST_ID).alias("o_is_entity"),
    )
    routed_new = _apply(routed_old)
    if ins_ids is not None:
        routed_ins = route_triples(ins_ids, n_parts).join(
            F.broadcast(parts), "part", "leftsemi"
        ).select("part", "s", "p", "o", "o_is_entity")
        routed_new = routed_new.unionByName(routed_ins)
    internal = internal_vertices(routed_new, n_parts)
    rebuilt_adj = adjacency(routed_new, internal).localCheckpoint()
    new_nv_aff = rebuilt_adj.filter("is_internal").count()

    # -- 2. predicate-first table: re-merge affected pbucket= dirs --------
    pb_list = sorted({
        r["pb"] for r in changed.select(
            F.pmod(F.col("p"), F.lit(pred_k)).cast("int").alias("pb")
        ).distinct().collect()
    })
    tp_scope = _apply(
        tbp.filter(F.col("pbucket").isin(pb_list)).select("s", "p", "o", "o_is_entity")
    )
    if ins_ids is not None:
        tp_scope = tp_scope.unionByName(ins_ids.select("s", "p", "o", "o_is_entity"))
    tp_rows = (
        predicate_bucketed_triples(tp_scope, pred_k)
        .repartition(F.col("pbucket"), F.col("s"))
        .sortWithinPartitions("p", "s", "o")
        .localCheckpoint()
    )

    # -- 3. vertex_preds: derived from the rebuilt partitions -------------
    vp_rows = vertex_predicate_sets(
        rebuilt_adj.filter("is_internal")
    ).localCheckpoint()

    # -- 4. signatures of vertices incident to the change -----------------
    aff_v = (
        changed.select(F.col("s").alias("v"))
        .unionAll(changed.filter("o_is_entity").select(F.col("o").alias("v")))
        .distinct()
        .localCheckpoint()
    )

    def _incident(adj_df):
        """Full neighborhood of every affected vertex, read from its OWNER
        partition's blocks (owners of changed endpoints are affected by
        construction): out-list = its subject triples, in-list = its
        entity-object triples. Duplicates across the union are harmless —
        the signature aggregation is an idempotent OR."""
        own = adj_df.filter("is_internal").join(aff_v, "v", "leftsemi")
        out = own.select(
            F.col("v").alias("s"), F.explode("out").alias("e")
        ).select(
            "s", F.col("e.p").alias("p"), F.col("e.o").alias("o"),
            (F.col("e.o") < LITERAL_FIRST_ID).alias("o_is_entity"),
        )
        inn = own.select(
            F.col("v").alias("o"), F.explode("in").alias("e")
        ).select(
            F.col("e.s").alias("s"), F.col("e.p").alias("p"), "o",
            F.lit(True).alias("o_is_entity"),
        )
        return out.unionByName(inn)

    def _placements(inc):
        """Every partition holding a signature row for an affected vertex —
        the reference replicates a vertex's signature into each partition
        the vertex APPEARS in (partitioned_signatures joins ALL internal
        rows, replicas included), so a changed signature must be rewritten
        in owner + every crossing placement: owner(v) plus owner(other
        entity endpoint) of each incident edge."""
        self_p = aff_v.select("v", owner(F.col("v"), n_parts).alias("part"))
        via_obj = inc.filter("o_is_entity").join(
            aff_v.withColumnRenamed("v", "s"), "s", "leftsemi"
        ).select(F.col("s").alias("v"), owner(F.col("o"), n_parts).alias("part"))
        via_sub = inc.join(
            aff_v.withColumnRenamed("v", "o"), "o", "leftsemi"
        ).select(F.col("o").alias("v"), owner(F.col("s"), n_parts).alias("part"))
        return self_p.unionAll(via_obj).unionAll(via_sub).distinct()

    incident_new = _incident(rebuilt_adj)
    incident_old = _incident(adj_aff)
    placements_new = _placements(incident_new).localCheckpoint()
    placements_all = (
        placements_new.unionAll(_placements(incident_old)).distinct()
    )
    new_sigs = (
        vertex_signatures_from_ids(incident_new, entity2, literal2)
        .join(aff_v, "v", "leftsemi")
        .join(placements_new, "v")  # one row per (placement part, v)
        .withColumn("bucket", F.pmod(F.xxhash64("v"), F.lit(sig_b)).cast("int"))
    )
    sig_dirs = [
        (r["part"], r["bucket"])
        for r in placements_all.select(
            "part", F.pmod(F.xxhash64("v"), F.lit(sig_b)).cast("int").alias("bucket"),
        ).distinct().collect()
    ]
    dir_cond = F.lit(False)
    for pt, bk in sig_dirs:
        dir_cond = dir_cond | ((F.col("part") == pt) & (F.col("bucket") == bk))
    carried = art.signatures.filter(dir_cond).join(aff_v, "v", "left_anti")
    sig_rows = carried.select("v", "sig", "part", "bucket").unionByName(
        new_sigs.select("v", "sig", "part", "bucket")
    ).localCheckpoint()

    # -- 5. bucket_sig / part_sig: small OR-tables, merged ----------------
    new_bucket_rows = sig_or(sig_rows, ["part", "bucket"], "sig")
    keys = spark.createDataFrame(sig_dirs, "part int, bucket int")
    bucket_sig_rows = (
        art.bucket_sig.join(keys, ["part", "bucket"], "left_anti")
        .unionByName(new_bucket_rows)
        .localCheckpoint()
    )
    part_sig_rows = sig_or(bucket_sig_rows, ["part"], "sig").localCheckpoint()

    # -- 6. pred_stats: affected predicates, from the rebuilt buckets -----
    pid_list = sorted({r["p"] for r in changed.select("p").distinct().collect()})
    new_stats = predicate_stats(
        tp_rows.filter(F.col("p").isin(pid_list)).select("s", "p", "o", "o_is_entity")
    )
    stats_rows = (
        art.pred_stats.join(
            spark.createDataFrame([(int(p),) for p in pid_list], "pid long"),
            "pid", "left_anti",
        ).unionByName(new_stats).localCheckpoint()
    )

    # -- write phase (everything above is materialized) -------------------
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt_adj.write.mode("overwrite").partitionBy("part").parquet(
            f"{art_dir}/adjacency"
        )
        tp_rows.write.mode("overwrite").partitionBy("pbucket").parquet(
            f"{art_dir}/triples_by_pred"
        )
        vp_rows.select("part", "v", "out_preds", "in_preds").write.mode(
            "overwrite"
        ).partitionBy("part").parquet(f"{art_dir}/vertex_preds")
        sig_rows.write.mode("overwrite").partitionBy("part", "bucket").parquet(
            f"{art_dir}/signatures"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data: an affected dir whose content became EMPTY (e.g. a predicate
    # bucket losing its last triple) is never touched and would leak stale
    # rows — drop those dirs explicitly
    def _present(df, cols):
        return {tuple(r[c] for c in cols) for r in df.select(*cols).distinct().collect()}

    stale = [
        f"{art_dir}/adjacency/part={pt}"
        for pt in set(part_list) - {t[0] for t in _present(rebuilt_adj, ["part"])}
    ] + [
        f"{art_dir}/triples_by_pred/pbucket={pb}"
        for pb in set(pb_list) - {t[0] for t in _present(tp_rows, ["pbucket"])}
    ] + [
        f"{art_dir}/vertex_preds/part={pt}"
        for pt in set(part_list) - {t[0] for t in _present(vp_rows, ["part"])}
    ] + [
        f"{art_dir}/signatures/part={pt}/bucket={bk}"
        for (pt, bk) in set(sig_dirs) - _present(sig_rows, ["part", "bucket"])
    ]
    if stale:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for path in stale:
            jp = jvm.org.apache.hadoop.fs.Path(path)
            jp.getFileSystem(hconf).delete(jp, True)
    bucket_sig_rows.write.mode("overwrite").parquet(f"{art_dir}/bucket_sig")
    part_sig_rows.write.mode("overwrite").parquet(f"{art_dir}/part_sig")
    stats_rows.write.mode("overwrite").parquet(f"{art_dir}/pred_stats")
    for d, name in ((d_e, "entity_dict"), (d_l, "literal_dict"), (d_p, "pred_dict")):
        if d.take(1):
            d.write.mode("append").parquet(f"{art_dir}/{name}")
    if inserts is not None and art.free_ids is not None:
        # holes handed out above are no longer free; materialize the
        # remainder before overwriting the dir its plan reads
        consumed = d_e.select("id").unionAll(d_l.select("id")).unionAll(
            d_p.select("id")
        )
        leftover = art.free_ids.join(consumed, "id", "left_anti").localCheckpoint()
        leftover.write.mode("overwrite").parquet(f"{art_dir}/free_ids")
    meta = dict(art.meta)
    n_vertices = int(meta.get("n_vertices", 0)) + (new_nv_aff - old_nv_aff)
    spark.createDataFrame(
        [(max(int(meta.get("format", 3)), 3), sig_b, pred_k, True,
          n_vertices, n_parts)],
        "format int, sig_buckets int, pred_buckets int, hash_routed boolean,"
        " n_vertices long, n_parts int",
    ).coalesce(1).write.mode("overwrite").json(f"{art_dir}/meta")
    return GraphArtifact(spark, art_dir)
