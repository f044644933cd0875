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


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    n_parts: int = 4,
    store: StageStore | None = None,
    partition_map: DataFrame | None = None,
    salt_threshold: int = 100_000,
    canon_checkpoint_dir: str | None = None,
) -> PipelineResult:
    def stage(name: str, df: DataFrame, part_col: str | None = None) -> DataFrame:
        if store is None:
            # every stage output is consumed by 2+ downstream plans; without
            # a snapshot store, cut BOTH recomputation and plan growth:
            # localCheckpoint truncates the logical plan to a LogicalRDD, so
            # downstream stages don't pay Catalyst re-analysis of the entire
            # upstream tree (the dominant fixed cost once the tree contains
            # the LSH aggregates and the CC fixpoint output)
            return df.localCheckpoint(eager=False)
        return store.materialize(name, df, part_col)

    docs = stage("extracted", E.extracted(documents))
    mentions = stage("mention_triples", Tr.mention_triples(docs))
    triples = stage(
        "canonical_triples",
        C.canonical_triples_from_mentions(mentions, checkpoint_dir=canon_checkpoint_dir),
    )

    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    entity_dict = stage("entity_dict", entity_dict)
    literal_dict = stage("literal_dict", literal_dict)
    pred_dict = stage("pred_dict", pred_dict)

    id_triples = stage(
        "id_triples", I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
    )
    routed = stage("routed", P.route_triples(id_triples, n_parts, partition_map), "part")
    internal = stage("internal", P.internal_vertices(routed, n_parts, partition_map), "part")

    hot = P.hot_subjects(routed, salt_threshold)
    salted = P.salted_shuffle_key(routed, hot)
    adj = stage("adjacency", B.adjacency(salted, internal, salt_col="salt"), "part")

    sigs = stage("signatures", B.vertex_signatures(triples, pred_dict, entity_dict))
    part_sigs = B.partitioned_signatures(sigs, internal)
    part_sig = stage("part_sig", B.partition_signature(part_sigs), "part")

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
    docs = E.extracted(documents)
    return C.canonical_triples_from_mentions(Tr.mention_triples(docs))
