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


def adjacency(
    routed: DataFrame,
    internal: DataFrame,
    salt_col: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """routed id-triples -> adjacency(part, v, is_internal, out, in).

    ``out`` = sorted array<struct<p,o>> (s2po), ``in`` = sorted
    array<struct<p,s>> (o2ps). With ``salt_col`` present, aggregation is
    two-level: per-salt partial collect, then flatten+merge per vertex.

    Unsalted shape is ONE exchange: out- and in-edge rows are tagged and
    unioned, then a single groupBy(part, v) carries two conditional
    collect_list accumulators (nulls are skipped, so each row lands in
    exactly one array). The previous shape shuffled the same rows through
    TWO groupBys and stitched them with a full_outer join — same bytes,
    two extra stages (guide §2.4 "two operations keyed the same way can
    share one exchange").

    ``n_parts``: for hash-routed builds, is_internal is pure arithmetic
    (owner(v) == part, gloadD.cpp:118-153) — computed inline instead of
    joining the ``internal`` relation (one less join over every placed
    vertex). Callers with a partition map keep the join.
    """
    from gstored_spark.kg.partition import owner

    if salt_col:
        out_part = routed.groupBy("part", F.col("s").alias("v"), F.col(salt_col)).agg(
            F.collect_list(F.struct(F.col("p"), F.col("o"))).alias("chunk")
        )
        out_edges = out_part.groupBy("part", "v").agg(
            F.sort_array(F.flatten(F.collect_list("chunk"))).alias("out")
        )
        in_edges = routed.filter("o_is_entity").groupBy("part", F.col("o").alias("v")).agg(
            F.sort_array(F.collect_list(F.struct(F.col("p"), F.col("s")))).alias("in")
        )
        adj = out_edges.join(in_edges, ["part", "v"], "full_outer")
        out_col, in_col = (
            F.coalesce("out", F.array().cast("array<struct<p:long,o:long>>")),
            F.coalesce("in", F.array().cast("array<struct<p:long,s:long>>")),
        )
    else:
        tagged = routed.select(
            "part",
            F.col("s").alias("v"),
            F.struct(F.col("p"), F.col("o")).alias("eo"),
            F.lit(None).cast("struct<p:long,s:long>").alias("ei"),
        ).unionByName(
            routed.filter("o_is_entity").select(
                "part",
                F.col("o").alias("v"),
                F.lit(None).cast("struct<p:long,o:long>").alias("eo"),
                F.struct(F.col("p"), F.col("s")).alias("ei"),
            )
        )
        adj = tagged.groupBy("part", "v").agg(
            F.sort_array(F.collect_list("eo")).alias("out"),
            F.sort_array(F.collect_list("ei")).alias("in"),
        )
        out_col, in_col = F.col("out"), F.col("in")
    if n_parts is not None:
        flag = owner(F.col("v"), n_parts) == F.col("part")
    else:
        adj = adj.join(internal, ["part", "v"], "left")
        flag = F.coalesce("is_internal", F.lit(False))
    return adj.select(
        "part",
        "v",
        flag.alias("is_internal"),
        out_col.alias("out"),
        in_col.alias("in"),
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
    id_triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    term_bits_impl: str = "udf",
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
    from gstored_spark.functions.signature import term_str_bits_col

    bits = (
        term_str_bits_col(F.col("term"))
        if term_bits_impl == "col"
        else term_str_bits_udf(F.col("term"))
    )
    term_bits = (
        entity_dict.unionByName(literal_dict)
        .select("id", bits.alias("nb"))
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
# vertices per (part, bucket) OR-group. 4096 (was 1024): each (part, bucket)
# pair is a parquet DIRECTORY with one file, so the target directly sets the
# store's file count and file size — at 1024 a 1.66M-vertex store wrote
# 2,048 files of ~50 KB and the per-file writer open/footer/close overhead
# dominated the signature-tree write (measured 7.6 s from checkpointed
# input; ~3 ms/file). 4x coarser buckets cut that 4x while staying well
# inside the same pruning regime (bucket_sig covers-pruning is conservative
# at any granularity; guide §6 "aim for fewer, larger output files").
SIG_BUCKET_TARGET_VERTICES = 4096
SIG_BUCKETS_MAX = 4096


def adaptive_sig_buckets(
    n_vertices: int,
    n_parts: int,
    target: int = SIG_BUCKET_TARGET_VERTICES,
    lo: int = SIG_BUCKETS,
    hi: int = SIG_BUCKETS_MAX,
) -> int:
    """Bucket count B scaled with per-partition vertex count — the VS*-tree
    grows by node splits as vertices arrive (VSTree/VSTree.cpp:371-440), so
    its fanout tracks the data; a constant B saturates every bucket OR at
    100x the vertices exactly like the root did. B = next power of two
    covering ``per_part / target``, clamped to [lo, hi]; power of two keeps
    pmod cheap and directory counts predictable."""
    per_part = max(n_vertices // max(n_parts, 1), 1)
    b = lo
    while b < hi and per_part > b * target:
        b *= 2
    return b


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
    """p2num statistics (KVstore/KVstore.h:296-301 preID2num) plus the
    per-predicate distinct-endpoint counts that stand in for the reference's
    subIDpreID2num/objIDpreID2num trees: ``n / n_s`` is the average
    out-fanout of predicate p (what sp2o returns per subject on average),
    ``n / n_o`` the in-fanout. Persisted with the artifact so the matcher's
    cardinality-based join ordering (Join.cpp:71-77 score) estimates a
    bound-endpoint probe from measured fanout instead of a flat constant.

    ``n_lit`` counts triples whose object is a LITERAL: a predicate with
    n_lit = 0 guarantees its object bindings are entities, which licenses
    the o2p satellite prefilter even for object-only vars (the F5
    literal-candidate rationale, Join.cpp:2242-2395, evaluated per
    predicate from measured data instead of per query shape)."""
    n_lit = (
        F.sum(F.when(F.col("o_is_entity"), 0).otherwise(1))
        if "o_is_entity" in id_triples.columns
        else F.lit(None).cast("long")
    )
    return id_triples.groupBy(F.col("p").alias("pid")).agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("s").alias("n_s"),
        F.approx_count_distinct("o").alias("n_o"),
        n_lit.alias("n_lit"),
    )


PRED_BUCKETS = 32


def predicate_bucketed_triples(id_triples: DataFrame, buckets: int = PRED_BUCKETS) -> DataFrame:
    """The predicate-FIRST physical order (p2s/p2o/p2so analog,
    KVstore/KVstore.h:265-293; dispatched by Strategy.cpp:272-362 for
    ``?s <p> ?o`` shapes): id triples keyed by ``pbucket = pmod(p, K)``.
    Written with partitionBy("pbucket") + sortWithinPartitions(p, s, o),
    a constant-predicate pattern is answered by (a) pbucket directory
    pruning, (b) the pushed-down ``p = const`` parquet filter over
    row-groups whose min/max p stats are tight because of the sort — the
    columnar twin of walking one predicate's B+-subtree, instead of
    exploding the whole adjacency store."""
    return id_triples.select("s", "p", "o", "o_is_entity").withColumn(
        "pbucket", F.pmod(F.col("p"), F.lit(buckets)).cast("int")
    )


def write_artifact(
    result,
    out_dir: str,
    mode: str = "overwrite",
    hash_routed: bool = True,
    pred_buckets: int = PRED_BUCKETS,
    sig_bucket_target: int = SIG_BUCKET_TARGET_VERTICES,
) -> None:
    """PipelineResult -> on-disk graph store:
    adjacency/ (part=...), triples_by_pred/ (pbucket=..., the p2s/p2o
    predicate-first order), vertex_preds/ (persisted s2p/o2p sets),
    signatures/ (part=/bucket=, bucket count adaptive in the vertex count),
    part_sig/, bucket_sig/, pred_stats/, the three dictionaries, and meta/
    (one JSON row: layout facts queries need — bucket counts and whether
    routing was pure-hash, i.e. every vertex has an internal owner).

    ``hash_routed=False`` records that a partial partition map routed the
    build (gloadD.cpp:148-152: unmapped vertices broadcast everywhere,
    internal NOWHERE) — matchers must then not rely on per-partition
    internal flags for owner-unique semantics (see match_partitioned).

    The table writes are INDEPENDENT jobs given the result DataFrames, so
    they are submitted from concurrent driver threads and the store build
    costs the slowest chain, not the sum — a serial writer leaves most of
    a many-core executor idle at every job barrier (the reference writes
    serially because one B+-tree writer owns its store,
    Database.cpp:1543-1615; parquet dirs have no such constraint)."""
    from concurrent.futures import ThreadPoolExecutor

    spark = result.adjacency.sparkSession

    def w_adjacency():
        result.adjacency.write.mode(mode).partitionBy("part").parquet(
            f"{out_dir}/adjacency"
        )

    def w_triples_by_pred():
        # predicate-first access path: spread each pbucket over subject-hash
        # tasks (a hot predicate must not serialize into one writer), sort so
        # row-group (p, s) min/max stats are tight for the pushed filter
        tp = predicate_bucketed_triples(result.id_triples, pred_buckets)
        tp.repartition(F.col("pbucket"), F.col("s")).sortWithinPartitions(
            "p", "s", "o"
        ).write.mode(mode).partitionBy("pbucket").parquet(f"{out_dir}/triples_by_pred")

    def w_vertex_preds():
        # persisted s2p/o2p (KVstore.h:265-293): the F4 satellite prefilter
        # reads THIS small table instead of re-deriving predicate sets from
        # the full adjacency store on every query; part= dirs let
        # update_artifact patch exactly the partitions a change set touches
        vertex_predicate_sets(result.adjacency.filter("is_internal")).select(
            "part", "v", "out_preds", "in_preds"
        ).write.mode(mode).partitionBy("part").parquet(f"{out_dir}/vertex_preds")

    # n_parts is a LAYOUT constant (owner() modulus): max(part)+1 over every
    # placed vertex — countDistinct over internal-only rows would undercount
    # when a partition happens to own no vertex, and update_artifact routes
    # changes with this modulus
    def w_signature_tree():
        counts = result.internal.agg(
            F.count(F.when(F.col("is_internal"), 1)).alias("nv"),
            (F.max("part") + 1).alias("np"),
        ).collect()[0]
        sig_buckets = adaptive_sig_buckets(
            counts["nv"], counts["np"], target=sig_bucket_target
        )
        # materialized ONCE: both the directory write and bucket_signature
        # consume part_sigs; unchekpointed, each re-derived the
        # signatures-x-internal join and bucket assignment (~3 s at 1.7M
        # vertices)
        part_sigs = with_sig_buckets(
            partitioned_signatures(result.signatures, result.internal), sig_buckets
        ).localCheckpoint(eager=True)
        # (part, bucket) are both partition directories: the matcher's
        # disjunctive (part, bucket) filter prunes at file level on both.
        # Cluster rows by those columns BEFORE the dynamic-partition write:
        # without it every writer task emits a file into every directory it
        # sees — tasks x (parts*buckets) files (measured 65,536 files /
        # 566 MB at 1.7M triples, the bulk of a 133 s store write; one file
        # per directory cuts that ~32x and speeds every later read's
        # listing too)
        part_sigs.repartition(F.col("part"), F.col("bucket")).write.mode(
            mode
        ).partitionBy("part", "bucket").parquet(f"{out_dir}/signatures")
        bucket_signature(part_sigs).write.mode(mode).parquet(f"{out_dir}/bucket_sig")
        spark.createDataFrame(
            [(3, sig_buckets, pred_buckets, hash_routed, counts["nv"], counts["np"])],
            "format int, sig_buckets int, pred_buckets int, hash_routed boolean,"
            " n_vertices long, n_parts int",
        ).coalesce(1).write.mode(mode).json(f"{out_dir}/meta")

    def w_small_tables():
        result.part_sig.write.mode(mode).parquet(f"{out_dir}/part_sig")
        predicate_stats(result.id_triples).write.mode(mode).parquet(
            f"{out_dir}/pred_stats"
        )
        result.entity_dict.write.mode(mode).parquet(f"{out_dir}/entity_dict")
        result.literal_dict.write.mode(mode).parquet(f"{out_dir}/literal_dict")
        result.pred_dict.write.mode(mode).parquet(f"{out_dir}/pred_dict")

    chains = [w_adjacency, w_triples_by_pred, w_vertex_preds, w_signature_tree,
              w_small_tables]
    with ThreadPoolExecutor(max_workers=len(chains)) as pool:
        futures = [pool.submit(c) for c in chains]
        for f in futures:
            f.result()  # surface the first failure


class GraphArtifact:
    """Lazy reader over the emitted store (the query engine's view).
    Optional tables (``bucket_sig`` / ``pred_stats`` / ``triples_by_pred`` /
    ``vertex_preds``) are None for artifacts written before they existed —
    readers degrade to partition-only pruning, constants-first ordering,
    adjacency-explode reconstitution, and per-query predicate-set
    derivation respectively."""

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
        self.triples_by_pred = self._opt(spark, f"{art_dir}/triples_by_pred")
        self.vertex_preds = self._opt(spark, f"{art_dir}/vertex_preds")
        # (ns, id) holes a vacuum freed for reuse; None until first vacuum
        self.free_ids = self._opt(spark, f"{art_dir}/free_ids")
        self.meta = self._meta(spark, f"{art_dir}/meta")
        # match.py attaches driver-side statistics caches to this handle
        # lazily (_cached_pred_ids / _cached_pred_stats): collected once,
        # reused across queries like a long-lived server's catalog

    @property
    def hash_routed(self) -> bool:
        """True unless meta says a (possibly partial) partition map routed
        the build. Pre-meta artifacts were all written by hash routing."""
        return self.meta.get("hash_routed", True)

    @property
    def pred_buckets(self) -> int:
        return self.meta.get("pred_buckets", PRED_BUCKETS)

    @staticmethod
    def _opt(spark, path):
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path)
        except AnalysisException:  # table absent in older artifacts
            return None

    @staticmethod
    def _meta(spark, path) -> dict:
        from pyspark.errors import AnalysisException

        try:
            rows = spark.read.json(path).collect()
            return rows[0].asDict() if rows else {}
        except AnalysisException:
            return {}


def compact_artifact(
    artifact,
    out_dir: str,
    pred_buckets: int = PRED_BUCKETS,
    sig_bucket_target: int = SIG_BUCKET_TARGET_VERTICES,
) -> "GraphArtifact":
    """Full-store compaction — the VS*-tree rebalance / bulk-rebuild analog
    after a history of in-place update batches (the reference splits
    VS*-tree nodes as inserts land, VSTree/VSTree.cpp:371-440, and rebuilds
    its trees wholesale on bulk load, Database.cpp:3038-3200).

    Each ``update_artifact`` batch leaves one extra parquet file per
    patched directory and keeps the signature-bucket count the store was
    BORN with — after enough growth 16 buckets saturate exactly like an
    unsplit tree node. Compaction rewrites the layout from the store's
    current logical content: adjacency (the source of truth) re-shuffled
    to one writer per part= directory, the predicate-first table and
    per-vertex predicate sets re-derived, per-vertex signatures KEPT
    (update_artifact already maintains them exactly — asserted against
    full rebuilds in tests) but re-bucketed with a bucket count re-adapted
    to the CURRENT per-partition vertex count, and fresh p2num/fanout
    stats + meta.

    Writes to a NEW directory: a live store cannot be overwritten while
    its own tables are being read; callers swap directories afterwards
    (the snapshot pattern the pipeline uses everywhere)."""
    import os

    from gstored_spark.kg.pipeline import PipelineResult

    if os.path.abspath(out_dir) == os.path.abspath(artifact.dir):
        raise ValueError("compact_artifact must write to a new directory")
    spark = artifact.adjacency.sparkSession

    if artifact.triples_by_pred is not None:
        id_triples = artifact.triples_by_pred.select("s", "p", "o", "o_is_entity")
    else:  # pre-format-2 store: reconstitute; literal ids have their own range
        from gstored_spark.kg.ids import LITERAL_FIRST_ID

        id_triples = triples_from_adjacency(artifact.adjacency).withColumn(
            "o_is_entity", F.col("o") < F.lit(LITERAL_FIRST_ID)
        )
    internal = artifact.adjacency.select("part", "v", "is_internal")
    # one vertex -> one global signature; placements replicate it, so any
    # one row per v is the signature (dropDuplicates = one shuffle on v)
    sigs = artifact.signatures.select("v", "sig").dropDuplicates(["v"])
    res = PipelineResult(
        triples=None,
        entity_dict=artifact.entity_dict,
        literal_dict=artifact.literal_dict,
        pred_dict=artifact.pred_dict,
        id_triples=id_triples,
        routed=None,
        internal=internal,
        # hash-repartition on part -> every part= dir written by ONE task:
        # K update batches' K+1 files collapse to one per directory
        adjacency=artifact.adjacency.repartition(F.col("part")),
        signatures=sigs,
        part_sig=partition_signature(partitioned_signatures(sigs, internal)),
    )
    write_artifact(
        res,
        out_dir,
        hash_routed=artifact.hash_routed,
        pred_buckets=pred_buckets,
        sig_bucket_target=sig_bucket_target,
    )
    if artifact.free_ids is not None:
        # compaction preserves the logical content, so term liveness — and
        # with it the vacuumed hole set — carries over unchanged
        artifact.free_ids.write.mode("overwrite").parquet(f"{out_dir}/free_ids")
    return GraphArtifact(spark, out_dir)


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
