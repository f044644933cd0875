"""Stage 6: gStoreD vertex partitioning — subject routing + crossing-edge
replication + internal-vertex flags + hub-subject salting.

Reference semantics (Main/gloadD.cpp:118-153): each triple goes to its
subject's partition; if the object is an *entity* owned by a different
partition, the triple is **replicated** there too (a crossing edge). A
vertex is *internal* to the partition that owns it and a boundary replica
elsewhere (internal-vertex bitmap, Database/Database.cpp:1572-1639). This
replication is what makes star queries answerable with zero assembly
(Database.cpp:661-671) — the property our partition layout preserves.

Owner function: ``pmod(xxhash64(v), N)`` by default (the papers' uniform
hash, VLDBJ §7 "Setting"), or an explicit broadcast partition map
(the worked example's internal-vertices file, README.md:28).

Hub skew (north rule: "salted repartitioning by subject-hash"): the
physical shuffle key is salted with the object hash for subjects whose
degree exceeds ``salt_threshold`` — partition *assignment* stays pure
(owner(v) is still the subject's hash; salting only spreads the rows of one
hot subject across shuffle tasks while building adjacency). AQE skew-join
splitting backstops anything the threshold misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def owner(col, n_parts: int) -> "F.Column":
    """owner(v) = pmod(xxhash64(v), N) — uniform hash partitioner."""
    return F.pmod(F.xxhash64(col), F.lit(n_parts)).cast("int")


def route_triples(
    id_triples: DataFrame,
    n_parts: int,
    partition_map: DataFrame | None = None,
) -> DataFrame:
    """id_triples(s, p, o, o_is_entity) ->
    (s, p, o, o_is_entity, part, is_crossing)

    One copy per triple in the subject's partition, plus one replica in the
    object's partition for crossing entity edges (gloadD.cpp:127-146).
    With ``partition_map(vid long, part int)`` supplied, unmapped vertices
    broadcast to all partitions (gloadD.cpp:148-152 semantics)."""
    if partition_map is None:
        t = id_triples.withColumn("s_part", owner(F.col("s"), n_parts)).withColumn(
            "o_part",
            F.when(F.col("o_is_entity"), owner(F.col("o"), n_parts)).otherwise(
                F.lit(None).cast("int")
            ),
        )
    else:
        # The partition map is per-VERTEX (the reference keeps it in a disk
        # B+-tree because it does not fit memory, gloadD.cpp:44-65) — never
        # broadcast it unconditionally; at web scale these are shuffle joins
        # co-partitioned on the vertex id. maybe_broadcast hints broadcast
        # only while the map is genuinely small.
        from gstored_spark.kg.link import maybe_broadcast

        pm = maybe_broadcast(partition_map.select(F.col("vid"), F.col("part")))
        t = id_triples.join(
            pm.withColumnRenamed("vid", "s").withColumnRenamed("part", "s_part"),
            "s",
            "left",
        ).join(
            pm.withColumnRenamed("vid", "o").withColumnRenamed("part", "o_part"),
            "o",
            "left",
        )
        t = t.withColumn(
            "o_part", F.when(F.col("o_is_entity"), F.col("o_part")).otherwise(F.lit(None))
        )
        # gloadD.cpp:118-153 routing: mapped subject -> its partition; mapped
        # entity object in a different partition -> crossing replica; BOTH
        # endpoints unmapped -> broadcast to every partition. A triple whose
        # subject is unmapped but whose object is mapped gets ONLY the
        # object-partition copy (no broadcast, no duplicate).
        all_parts = F.sequence(F.lit(0), F.lit(n_parts - 1))
        primary = t.filter(F.col("s_part").isNotNull()).select(
            "s", "p", "o", "o_is_entity",
            F.col("s_part").alias("part"),
            F.lit(False).alias("is_crossing"),
        )
        crossing = t.filter(
            F.col("o_part").isNotNull()
            & (F.col("s_part").isNull() | (F.col("o_part") != F.col("s_part")))
        ).select(
            "s", "p", "o", "o_is_entity",
            F.col("o_part").alias("part"),
            F.lit(True).alias("is_crossing"),
        )
        broadcast_rows = t.filter(
            F.col("s_part").isNull() & F.col("o_part").isNull()
        ).select(
            "s", "p", "o", "o_is_entity",
            F.explode(all_parts).alias("part"),
            F.lit(False).alias("is_crossing"),
        )
        return primary.unionByName(crossing).unionByName(broadcast_rows)

    primary = t.select(
        "s", "p", "o", "o_is_entity",
        F.col("s_part").alias("part"),
        F.lit(False).alias("is_crossing"),
    )
    crossing = t.filter(
        F.col("o_part").isNotNull() & (F.col("o_part") != F.col("s_part"))
    ).select(
        "s", "p", "o", "o_is_entity",
        F.col("o_part").alias("part"),
        F.lit(True).alias("is_crossing"),
    )
    return primary.unionByName(crossing)


def internal_vertices(
    routed: DataFrame, n_parts: int, partition_map: DataFrame | None = None
) -> DataFrame:
    """-> (part, v, is_internal): every vertex present in a partition,
    flagged internal iff that partition owns it (internal_nodes.dat analog,
    Database.cpp:1572-1639)."""
    verts = routed.select("part", F.col("s").alias("v")).unionAll(
        routed.filter("o_is_entity").select("part", F.col("o").alias("v"))
    ).distinct()
    if partition_map is None:
        return verts.withColumn("is_internal", owner(F.col("v"), n_parts) == F.col("part"))
    from gstored_spark.kg.link import maybe_broadcast

    pm = maybe_broadcast(partition_map.select(F.col("vid").alias("v"), F.col("part").alias("own")))
    return verts.join(pm, "v", "left").select(
        "part", "v", (F.col("own") == F.col("part")).alias("is_internal")
    ).fillna({"is_internal": False})


def hot_subjects(routed: DataFrame, salt_threshold: int = 100_000) -> DataFrame:
    """Subjects whose out-degree exceeds the salting threshold."""
    return (
        routed.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") > salt_threshold)
        .select("s", "deg")
    )


def salted_shuffle_key(routed: DataFrame, hot: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Adds ``salt`` spreading hot subjects' rows over ``salt_buckets``
    shuffle keys (deterministic: salt = pmod(xxhash64(o), buckets)); cold
    subjects get salt 0. Downstream groupBys key on (part, s, salt) and then
    merge — two-level aggregation, the standard salting shape."""
    h = hot.select("s").withColumn("_hot", F.lit(True))
    return routed.join(F.broadcast(h), "s", "left").withColumn(
        "salt",
        F.when(
            F.col("_hot").isNotNull(), F.pmod(F.xxhash64("o"), F.lit(salt_buckets)).cast("int")
        ).otherwise(F.lit(0)),
    ).drop("_hot")
