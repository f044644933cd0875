"""Stage 7: adjacency blocks + vertex signatures per partition.

The reference's 12 adjacency B+-trees (KVstore/KVstore.h:265-293) collapse
into two columnar layouts per partition:
  s2po analog: out = sort_array(collect_list(struct(p, o)))  per (part, s)
  o2ps analog: in  = sort_array(collect_list(struct(p, s)))  per (part, o)
sorted arrays give the same binary-searchable (p -> neighbors) access the
reference gets from sp2o/op2s (values "sorted int arrays",
Database/Database.cpp:1189); parquet row-group stats + partition dirs give
the partition pruning the VS*-tree gave.

Signatures: per-vertex 800-bit bitmap from the exact reference formulas
(functions/signature.py, Signature/Signature.cpp:34-76,112-155), built from
the *string* triples exactly like the reference's build pass 1
(Database.cpp:1543-1562 ORs signature bits while dictionary-encoding);
per-partition OR-aggregate replaces the VS*-tree root (VSTree.cpp:146-219).

Salting: adjacency groupBys pre-aggregate on (part, s, salt) then merge per
(part, s) — the two-level shape that keeps one hot subject from pinning a
single reducer (kg/partition.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.functions.signature import (
    contribution_bits_udf,
    edge_bit_col,
    sig_or,
    sig_words_from_bits,
    term_str_bits_udf,
)


def adjacency(routed: DataFrame, internal: DataFrame, salt_col: str | None = None) -> DataFrame:
    """routed id-triples -> adjacency(part, v, is_internal, out, in).

    ``out`` = sorted array<struct<p,o>> (s2po), ``in`` = sorted
    array<struct<p,s>> (o2ps). With ``salt_col`` present, aggregation is
    two-level: per-salt partial collect, then flatten+merge per vertex.
    """
    if salt_col:
        out_part = routed.groupBy("part", F.col("s").alias("v"), F.col(salt_col)).agg(
            F.collect_list(F.struct(F.col("p"), F.col("o"))).alias("chunk")
        )
        out_edges = out_part.groupBy("part", "v").agg(
            F.sort_array(F.flatten(F.collect_list("chunk"))).alias("out")
        )
    else:
        out_edges = routed.groupBy("part", F.col("s").alias("v")).agg(
            F.sort_array(F.collect_list(F.struct(F.col("p"), F.col("o")))).alias("out")
        )
    in_edges = routed.filter("o_is_entity").groupBy("part", F.col("o").alias("v")).agg(
        F.sort_array(F.collect_list(F.struct(F.col("p"), F.col("s")))).alias("in")
    )
    adj = out_edges.join(in_edges, ["part", "v"], "full_outer")
    adj = adj.join(internal, ["part", "v"], "left")
    return adj.select(
        "part",
        "v",
        F.coalesce("is_internal", F.lit(False)).alias("is_internal"),
        F.coalesce("out", F.array().cast("array<struct<p:long,o:long>>")).alias("out"),
        F.coalesce("in", F.array().cast("array<struct<p:long,s:long>>")).alias("in"),
    )


def vertex_predicate_sets(adj: DataFrame) -> DataFrame:
    """F4 per-vertex predicate sets (the s2p/o2p indexes,
    KVstore/KVstore.h:265-293) as a derived view of the adjacency blocks —
    the satellite pre-filter (Join::filterBySatellites, Join.cpp:2419-2700)
    becomes ``array_contains(out_preds, p)`` semi-join pruning."""
    return adj.select(
        "part",
        "v",
        F.array_distinct(F.transform("out", lambda e: e["p"])).alias("out_preds"),
        F.array_distinct(F.transform("in", lambda e: e["p"])).alias("in_preds"),
    )


def signature_contributions(triples: DataFrame, pred_dict: DataFrame) -> DataFrame:
    """canonical string triples + pred ids -> (v_term, bits array<int>).

    Subject vertex: bits of the *object string* neighbor + out-edge
    predicate bit; entity object vertex: bits of the subject string + an
    in-edge predicate bit (Signature.cpp encodeStr2Entity applies to both
    subjects' and objects' neighborhoods; direction only affects the edge
    interval)."""
    t = triples.join(
        F.broadcast(pred_dict.withColumnRenamed("term", "pred").withColumnRenamed("id", "pid")),
        "pred",
    )
    sub = t.select(
        F.col("subj").alias("v_term"),
        contribution_bits_udf(F.col("obj"), F.col("pid"), F.lit(True)).alias("bits"),
    )
    obj = t.filter("o_is_entity").select(
        F.col("obj").alias("v_term"),
        contribution_bits_udf(F.col("subj"), F.col("pid"), F.lit(False)).alias("bits"),
    )
    return sub.unionByName(obj)


def vertex_signatures(
    triples: DataFrame, pred_dict: DataFrame, entity_dict: DataFrame
) -> DataFrame:
    """-> signatures(v long, sig array<long>[13]) for entity vertices."""
    contrib = signature_contributions(triples, pred_dict)
    sigs = sig_words_from_bits(contrib, ["v_term"], "bits")
    return sigs.join(
        entity_dict.withColumnRenamed("term", "v_term").withColumnRenamed("id", "v"),
        "v_term",
    ).select("v", "sig")


def vertex_signatures_from_ids(
    id_triples: DataFrame, entity_dict: DataFrame, literal_dict: DataFrame
) -> DataFrame:
    """-> signatures(v long, sig array<long>[13]) — bit-identical to
    vertex_signatures, restructured for scale: the 3 neighbor-string hashes
    run ONCE PER DISTINCT TERM over the dictionaries (term_str_bits_udf,
    ~|terms| Arrow rows), and the per-occurrence work is two long-keyed
    joins plus JVM edge-bit arithmetic (edge_bit_col) — ~10x less Python/
    Arrow traffic than hashing every neighbor occurrence, and the signature
    aggregation shuffles on vertex IDs instead of strings.

    Reference semantics unchanged: subject vertex ORs its object-neighbor
    string bits + out-edge predicate bit; entity-object vertex ORs the
    subject's string bits + in-edge predicate bit
    (Database.cpp:1543-1562 build pass, Signature.cpp:34-76,112-155)."""
    term_bits = (
        entity_dict.unionByName(literal_dict)
        .select("id", term_str_bits_udf(F.col("term")).alias("nb"))
        .localCheckpoint(eager=False)  # two consumers; cache on first use
    )
    sub = (
        id_triples.join(term_bits.withColumnRenamed("id", "o"), "o")
        .select(
            F.col("s").alias("v"),
            F.concat(F.col("nb"), F.array(edge_bit_col(F.col("p"), True))).alias("bits"),
        )
    )
    obj = (
        id_triples.filter("o_is_entity")
        .join(term_bits.withColumnRenamed("id", "s"), "s")
        .select(
            F.col("o").alias("v"),
            F.concat(F.col("nb"), F.array(edge_bit_col(F.col("p"), False))).alias("bits"),
        )
    )
    return sig_words_from_bits(sub.unionByName(obj), ["v"], "bits")


def partitioned_signatures(signatures: DataFrame, internal: DataFrame) -> DataFrame:
    """signatures placed per partition -> (part, v, sig)."""
    return internal.select("part", "v").join(signatures, "v")


def partition_signature(part_sigs: DataFrame) -> DataFrame:
    """OR-aggregate per partition -> part_sig(part, sig) — VS*-tree root
    analog used for whole-partition pruning before a BGP join."""
    return sig_or(part_sigs, ["part"], "sig")


SIG_BUCKETS = 16


def with_sig_buckets(part_sigs: DataFrame, buckets: int = SIG_BUCKETS) -> DataFrame:
    """Add the VS*-tree *inner-level* key under each partition:
    bucket = pmod(xxhash64(v), B). Deterministic in the vertex id, so the
    same vertex lands in the same bucket at any parallelism."""
    return part_sigs.withColumn(
        "bucket", F.pmod(F.xxhash64("v"), F.lit(buckets)).cast("int")
    )


def bucket_signature(bucketed_sigs: DataFrame) -> DataFrame:
    """OR-aggregate per (part, bucket) — the VS*-tree inner-node analog
    (parent = OR of children, VSTree/VSTree.cpp:146-219) one level below the
    partition root. At production vertex counts a partition's root
    OR-signature saturates (every bit set) and root-only pruning degrades to
    scan-everything; the bucket level keeps pruning effective because each
    OR covers ~1/B of the vertices."""
    return sig_or(bucketed_sigs, ["part", "bucket"], "sig")


def write_blocks(adj: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Materialize adjacency blocks partitioned by graph partition — the
    parquet layout downstream BGP matching scans with partition pruning."""
    adj.write.mode(mode).partitionBy("part").parquet(f"{out_dir}/adjacency")


# ---- the full emitted artifact: what a query engine reads ------------------
#
# The reference's store is a directory of B+-trees + signature file +
# internal bitmap per partition (Database::load, Database.cpp:413-470).
# Ours is a directory of parquet tables; `part=` directories give the
# VS*-tree-style partition pruning (kg/match.py match_over_blocks reads a
# strict subset of them when query signatures allow).


def predicate_stats(id_triples: DataFrame) -> DataFrame:
    """p2num statistics (KVstore/KVstore.h:296-301 preID2num): per-predicate
    triple counts, persisted with the artifact so the matcher's
    cardinality-based join ordering (Join.cpp:71-77 score) works by default
    without a planning-time pass over the store."""
    return id_triples.groupBy(F.col("p").alias("pid")).agg(
        F.count(F.lit(1)).alias("n")
    )


def write_artifact(result, out_dir: str, mode: str = "overwrite") -> None:
    """PipelineResult -> on-disk graph store:
    adjacency/ (part=...), signatures/ (part=..., bucketed), part_sig/,
    bucket_sig/, pred_stats/, entity_dict/ literal_dict/ pred_dict/."""
    result.adjacency.write.mode(mode).partitionBy("part").parquet(f"{out_dir}/adjacency")
    part_sigs = with_sig_buckets(partitioned_signatures(result.signatures, result.internal))
    # (part, bucket) are both partition directories: the matcher's
    # disjunctive (part, bucket) filter prunes at file level on both
    part_sigs.write.mode(mode).partitionBy("part", "bucket").parquet(
        f"{out_dir}/signatures"
    )
    result.part_sig.write.mode(mode).parquet(f"{out_dir}/part_sig")
    bucket_signature(part_sigs).write.mode(mode).parquet(f"{out_dir}/bucket_sig")
    predicate_stats(result.id_triples).write.mode(mode).parquet(f"{out_dir}/pred_stats")
    result.entity_dict.write.mode(mode).parquet(f"{out_dir}/entity_dict")
    result.literal_dict.write.mode(mode).parquet(f"{out_dir}/literal_dict")
    result.pred_dict.write.mode(mode).parquet(f"{out_dir}/pred_dict")


class GraphArtifact:
    """Lazy reader over the emitted store (the query engine's view).
    ``bucket_sig`` / ``pred_stats`` are None for artifacts written before
    those tables existed (readers degrade to partition-only pruning and
    constants-first ordering)."""

    def __init__(self, spark, art_dir: str):
        self.dir = art_dir
        self.adjacency = spark.read.parquet(f"{art_dir}/adjacency")
        self.signatures = spark.read.parquet(f"{art_dir}/signatures")
        self.part_sig = spark.read.parquet(f"{art_dir}/part_sig")
        self.entity_dict = spark.read.parquet(f"{art_dir}/entity_dict")
        self.literal_dict = spark.read.parquet(f"{art_dir}/literal_dict")
        self.pred_dict = spark.read.parquet(f"{art_dir}/pred_dict")
        self.bucket_sig = self._opt(spark, f"{art_dir}/bucket_sig")
        self.pred_stats = self._opt(spark, f"{art_dir}/pred_stats")

    @staticmethod
    def _opt(spark, path):
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path)
        except AnalysisException:  # table absent in older artifacts
            return None


def triples_from_adjacency(adj: DataFrame) -> DataFrame:
    """Reconstitute the exact triple bag from adjacency blocks: explode the
    out-lists of INTERNAL vertices only — each triple's subject is internal
    in exactly one partition (its owner), so crossing replicas contribute
    nothing twice. Requires owner-complete subjects (hash owner, or a map
    covering every subject). -> (s, p, o) id triples."""
    return (
        adj.filter("is_internal")
        .select(F.col("v").alias("s"), F.explode("out").alias("e"))
        .select("s", F.col("e.p").alias("p"), F.col("e.o").alias("o"))
    )
