"""End-to-end KG construction pipeline (north rule):

  documents (url, warc_ts, html, text, lang)
    -> extract (pandas UDF, byte-identical per url)
    -> mention triples (pattern SVO)
    -> entity linking (broadcast alias dict, top-1 deterministic score)
    -> canonicalization (MinHash LSH blocking + connected components)
    -> dictionary encoding (entities [0,1e9), literals [1e9,2e9))
    -> partitioning (subject routing + crossing-edge replication + salting)
    -> adjacency blocks + vertex/partition signature bitmaps

Each stage snapshots through StageStore (resumable, per-partition metrics).
``run_pipeline`` with ``store=None`` runs fully lazy/in-memory (tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from gstored_spark.kg import blocks as B
from gstored_spark.kg import canon as C
from gstored_spark.kg import extract as E
from gstored_spark.kg import ids as I
from gstored_spark.kg import link as L
from gstored_spark.kg import partition as P
from gstored_spark.kg import triples as Tr
from gstored_spark.kg.metrics import StageStore


@dataclass
class PipelineResult:
    triples: DataFrame
    entity_dict: DataFrame
    literal_dict: DataFrame
    pred_dict: DataFrame
    id_triples: DataFrame
    routed: DataFrame
    internal: DataFrame
    adjacency: DataFrame
    signatures: DataFrame
    part_sig: DataFrame
    extras: dict = field(default_factory=dict)


def release_checkpoint(df: DataFrame) -> None:
    """Deterministically free a localCheckpoint()'s storage blocks.

    ``Dataset.unpersist`` goes through CacheManager.uncacheQuery and only
    drops persist()-cached plans — NOT the RDD-level blocks localCheckpoint
    creates, which otherwise live until the JVM RDD is GC'd. A
    checkpointed Dataset's analyzed plan is a LogicalRDD wrapping exactly
    that RDD, so unpersisting it releases the blocks (verified against
    SparkContext.getRDDStorageInfo in tests/test_pred_path.py)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # non-checkpointed plan (no .rdd accessor) — nothing to release
        pass


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    n_parts: int = 4,
    store: StageStore | None = None,
    partition_map: DataFrame | None = None,
    salt_threshold: int = 100_000,
    canon_checkpoint_dir: str | None = None,
    release_input: bool = False,
) -> PipelineResult:
    def stage(name: str, df: DataFrame, part_col: str | None = None) -> DataFrame:
        if store is None:
            # every stage output is consumed by 2+ downstream plans; without
            # a snapshot store, cut BOTH recomputation and plan growth:
            # localCheckpoint truncates the logical plan to a LogicalRDD, so
            # downstream stages don't pay Catalyst re-analysis of the entire
            # upstream tree. EAGER: lazy checkpoints let the final actions
            # interleave partially-materialized chains and re-derive shared
            # stages — measured 1.5x slower end-to-end at 10^6 docs than
            # materializing each stage once, in order. SERIALIZED storage
            # (+ spark.rdd.compress): checkpoint blocks compress several-
            # fold, cutting the memory footprint and scan bandwidth that
            # throttle a many-core executor — decompression spends CPU,
            # which the measured pipeline has idle (~25% utilization).
            return df.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        return store.materialize(name, df, part_col)

    # extraction has a single consumer (SVO extraction) — with no snapshot
    # store the two Python passes fuse into ONE mapInPandas over the raw
    # corpus (mention_triples_raw): the text corpus crosses the JVM<->Python
    # boundary once instead of three times (html out, text back, text out
    # again), guide §4.1
    if store is None:
        mentions = stage("mention_triples", Tr.mention_triples_raw(documents))
    else:
        docs = stage("extracted", E.extracted(documents))
        mentions = stage("mention_triples", Tr.mention_triples(docs))
    if release_input and store is None:
        # the corpus has exactly one consumer (the fused extract+SVO pass,
        # just materialized) — release its cached blocks so they stop
        # pressuring the block store for the rest of the run
        documents.unpersist()
    # scale-adaptive shuffle sizing for every mention-derived stage (guide
    # §2.2 "fewer, larger reduce partitions", made adaptive rather than a
    # constant): the session default is cluster/pipeline sizing (3x cores at
    # bench scale); for the measured mention count, target ~64k rows per
    # reduce partition with a floor at the executor parallelism so CPU-heavy
    # aggregations stay wide. At web scale rows/64k exceeds the session
    # default and this clamp is a no-op.
    spark_ = documents.sparkSession
    if store is None:
        n_mentions = mentions.count()  # one cheap job over checkpointed blocks
        session_parts = int(spark_.conf.get("spark.sql.shuffle.partitions"))
        target = min(
            session_parts,
            max(int(spark_.sparkContext.defaultParallelism), n_mentions // 64_000),
        )
    else:
        target = None

    class _scope:
        def __enter__(self):
            if target is not None:
                self.old = spark_.conf.get("spark.sql.shuffle.partitions")
                spark_.conf.set("spark.sql.shuffle.partitions", str(target))
            return self

        def __exit__(self, *exc):
            if target is not None:
                spark_.conf.set("spark.sql.shuffle.partitions", self.old)

    with _scope():
        return _run_pipeline_body(
            spark, documents, mentions, n_parts, store, partition_map,
            salt_threshold, canon_checkpoint_dir, stage,
        )


def _run_pipeline_body(
    spark, documents, mentions, n_parts, store, partition_map,
    salt_threshold, canon_checkpoint_dir, stage,
):
    triples = stage(
        "canonical_triples",
        C.canonical_triples_from_mentions(mentions, checkpoint_dir=canon_checkpoint_dir),
    )
    if store is None:
        # the mention stream is dead once the canonical triples exist;
        # free its checkpoint blocks (largest intermediate of the run)
        release_checkpoint(mentions)

    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    if store is None:
        # the three dictionary builds are independent shuffle chains over
        # the checkpointed triples — materialize them concurrently (the
        # StageStore path stays serial: concurrent appends to its _metrics
        # dir would race the file-commit protocol)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=3) as _pool:
            _fe = _pool.submit(stage, "entity_dict", entity_dict)
            _fl = _pool.submit(stage, "literal_dict", literal_dict)
            _fp = _pool.submit(stage, "pred_dict", pred_dict)
            entity_dict, literal_dict, pred_dict = (
                _fe.result(), _fl.result(), _fp.result(),
            )
    else:
        entity_dict = stage("entity_dict", entity_dict)
        literal_dict = stage("literal_dict", literal_dict)
        pred_dict = stage("pred_dict", pred_dict)

    id_triples = stage(
        "id_triples", I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    )
    routed = stage("routed", P.route_triples(id_triples, n_parts, partition_map), "part")
    internal = stage("internal", P.internal_vertices(routed, n_parts, partition_map), "part")

    # The adjacency chain and the signature chain are independent given
    # (routed, internal, triples) — run them CONCURRENTLY so one chain's
    # shuffle/straggler latency hides under the other's compute (Spark's
    # scheduler interleaves jobs from separate driver threads; with serial
    # submission each barrier idles most of the cluster at high core
    # counts). The reference builds these sequentially because a single
    # B+-tree writer owns the store (Database.cpp:1543-1615); we have no
    # such constraint.
    from concurrent.futures import ThreadPoolExecutor

    def adj_chain():
        hot = P.hot_subjects(routed, salt_threshold)
        # the degree scan runs either way (it is the broadcast build side of
        # the salting join); when it finds NO hot subject, skip the salt
        # join and the two-level collect/flatten/merge aggregation outright —
        # single-level adjacency is identical output for an all-cold graph
        # hash-routed builds compute is_internal arithmetically inside
        # adjacency (owner(v) == part); map-routed builds join `internal`
        np_ = n_parts if partition_map is None else None
        if hot.limit(1).count() == 0:
            return stage("adjacency", B.adjacency(routed, internal, n_parts=np_), "part")
        salted = P.salted_shuffle_key(routed, hot)
        return stage(
            "adjacency",
            B.adjacency(salted, internal, salt_col="salt", n_parts=np_),
            "part",
        )

    def sig_chain():
        # id-based build: per-term hashing + long-keyed joins
        # (vertex_signatures_from_ids; bit-identical to the string path,
        # equivalence-tested) — the string path hashed every neighbor
        # OCCURRENCE through Arrow and shuffled on term strings
        sigs = stage(
            "signatures",
            B.vertex_signatures_from_ids(id_triples, entity_dict, literal_dict),
        )
        part_sigs = B.partitioned_signatures(sigs, internal)
        return sigs, stage("part_sig", B.partition_signature(part_sigs), "part")

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_adj = pool.submit(adj_chain)
        f_sig = pool.submit(sig_chain)
        adj = f_adj.result()
        sigs, part_sig = f_sig.result()

    return PipelineResult(
        triples=triples,
        entity_dict=entity_dict,
        literal_dict=literal_dict,
        pred_dict=pred_dict,
        id_triples=id_triples,
        routed=routed,
        internal=internal,
        adjacency=adj,
        signatures=sigs,
        part_sig=part_sig,
    )


def triples_from_documents(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Shortcut: documents -> canonical string triples (the P/R surface)."""
    return C.canonical_triples_from_mentions(Tr.mention_triples_raw(documents))
