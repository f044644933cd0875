"""Stage 4: canonicalization — alias resolution via MinHash-LSH blocking +
connected components over the similarity-edge DataFrame.

The CC fixpoint is the Spark reincarnation of the reference's
assembly-until-fully-tagged loop (Util/Util.cpp:1777-1858 iterative
hash-joins driven from Main/gqueryD.cpp:405-440); lineage is checkpointed
per iteration (operators/cc.py).

Flow (all JVM-side except nothing — there is no Python here):
  distinct entity surfaces
    -> char-3-gram shingles -> MinHash (k=12) -> LSH bands (4)
    -> candidate pairs (bucket self-join) -> exact-Jaccard verify (>= tau)
    -> connected components -> canonical representative per component
       = min *fully-normalized* member (deterministic at any parallelism)
    -> surface -> canonical IRI map, applied to the triple stream.

Literals are normalized to the reference's lexical forms
(Parser/RDFParser.cpp:36-63): entities get <iri>, plain literals get
'"..."@en'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.operators.cc import components_with_singletons
from gstored_spark.operators.dedup import (
    char_shingles,
    lsh_band_keys_fast,
    lsh_verified_edges,
    minhash_signature_fast,
)
from gstored_spark.sources.corpus import normalize_mention_col


def entity_surfaces(linked: DataFrame) -> DataFrame:
    return (
        linked.select(F.col("subj_surface").alias("surface"))
        .unionAll(
            linked.filter("o_is_entity").select(F.col("obj_surface").alias("surface"))
        )
        .distinct()
    )


def surface_components(
    surfaces: DataFrame,
    tau: float = 0.8,
    k: int = 16,
    bands: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """surfaces(surface) -> (surface, component) where component is the min
    similar surface (string min over the cluster).

    Two blocking channels (multi-blocking ER): (1) exact full-normalization
    key — surfaces that normalize identically are connected outright;
    (2) MinHash-LSH bands (k=16, r=4) verified by exact Jaccard at a strict
    tau=0.8 — the LSH channel only merges near-identical strings
    (whitespace/punct variance); looser thresholds merge distinct entities
    whose names differ only in a numeric suffix (observed precision
    failure at 10^5-doc scale)."""
    from pyspark.storagelevel import StorageLevel

    # consumed twice (minhash chain + exact-Jaccard verify join) — without a
    # checkpoint the interpreted shingle transform re-runs for each consumer
    shingled = (
        surfaces.select(
            F.col("surface"), char_shingles(F.col("surface"), 3).alias("shingles")
        )
        .filter(F.size("shingles") > 0)
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    # xxhash64 family (JVM longs): canonicalization needs LSH recall, not
    # the md5 family's DuckDB-oracle parity (kept for the dedup operators).
    # Surfaces are short strings, so candidate generation and exact-Jaccard
    # verification fuse into one aggregation pass (lsh_verified_edges) —
    # edge set identical to the staged lsh_candidate_pairs+jaccard_verify.
    sig = minhash_signature_fast(shingled, "surface", "shingles", k)
    lsh_edges = lsh_verified_edges(
        lsh_band_keys_fast(sig, "surface", k, bands), shingled, "surface",
        threshold=tau,
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    normed = surfaces.select(
        "surface", normalize_mention_col(F.col("surface")).alias("norm")
    )
    hubs = normed.groupBy("norm").agg(F.min("surface").alias("hub"))
    norm_edges = (
        normed.join(hubs, "norm")
        .filter(F.col("surface") != F.col("hub"))
        .select(F.col("surface").alias("src"), F.col("hub").alias("dst"))
    )
    edges = lsh_edges.unionByName(norm_edges)
    return components_with_singletons(
        edges,
        surfaces.select(F.col("surface").alias("vertex")),
        checkpoint_dir=checkpoint_dir,
    ).select(F.col("vertex").alias("surface"), "component")


def canonical_map(
    surfaces: DataFrame, tau: float = 0.8, checkpoint_dir: str | None = None
) -> DataFrame:
    """(surface, canonical_iri): representative = min normalized member of
    the surface's component — parallelism-independent (SURVEY §7 hard-part
    1: sort-based tie-breaks, no monotonically_increasing_id)."""
    comps = surface_components(surfaces, tau=tau, checkpoint_dir=checkpoint_dir)
    normed = comps.withColumn("norm", normalize_mention_col(F.col("surface")))
    reps = normed.groupBy("component").agg(F.min("norm").alias("rep_norm"))
    return (
        normed.join(reps, "component")
        .select(
            "surface",
            F.concat(
                F.lit("<ent:"), F.regexp_replace("rep_norm", " ", "_"), F.lit(">")
            ).alias("canonical_iri"),
        )
    )


class _scoped_shuffle_partitions:
    """Temporarily right-size spark.sql.shuffle.partitions for a
    SMALL-relation computation scope (the surface/alias tables are
    O(distinct entities) — orders of magnitude under the corpus-sized
    stages the session default is tuned for). ~20 shuffle stages run over
    the surface table during canonicalization; at cluster-wide partition
    counts they are pure task-scheduling overhead that does not shrink
    with cores (measured: the canon block scaled 1.5x from 4->16 cores
    while corpus stages scaled 3-4x). At web scale ``rows`` is large and
    the clamp keeps the session default. Not safe under concurrent job
    submission from other threads — the pipeline runs its concurrent
    chains after this scope closes."""

    def __init__(self, spark, rows: int, rows_per_partition: int = 50_000):
        self.spark = spark
        self.target = max(4, min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            max(1, rows // rows_per_partition),
        ))

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.target))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def canonical_triples_from_mentions(
    mentions: DataFrame, tau: float = 0.8, checkpoint_dir: str | None = None
) -> DataFrame:
    """Fused link+canonicalize: mention triples -> canonical string triples
    with ONE pair of joins against the big mention stream.

    The link map (surface -> dictionary name, kg/link.py) and the canonical
    map (name -> IRI) are composed on the *small* surface table first;
    the 10^9-row mention stream is touched exactly twice (subject join,
    object join). This halves the full-stream shuffle/join work vs the
    staged link-then-canonicalize path (which remains available for
    stage-by-stage inspection/tests)."""
    from concurrent.futures import ThreadPoolExecutor

    from gstored_spark.kg.link import alias_dictionary, link_surfaces, maybe_broadcast

    # the alias dictionary and the distinct-surface table are independent
    # aggregations over the same (checkpointed) mention stream —
    # materialize them from concurrent driver threads so one shuffle's
    # barrier hides under the other's compute
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_alias = pool.submit(
            lambda: alias_dictionary(mentions).localCheckpoint(eager=True)
        )
        f_surf = pool.submit(
            lambda: mentions.select(F.col("subj_mention").alias("surface"))
            .unionAll(
                mentions.filter("o_is_entity").select(
                    F.col("obj_mention").alias("surface")
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        aliases = f_alias.result()
        surfaces = f_surf.result()
    links = link_surfaces(
        surfaces, aliases, checkpoint_aliases=False
    ).localCheckpoint(eager=True)
    # everything below the materialized link map works on surface-sized
    # relations — right-size its ~20 shuffle stages by measured row count
    # (the count is one fast job over the checkpointed blocks)
    with _scoped_shuffle_partitions(mentions.sparkSession, links.count()):
        linked_names = links.select(F.col("linked").alias("surface")).distinct()
        cmap = canonical_map(
            linked_names, tau=tau, checkpoint_dir=checkpoint_dir
        )
        composed = maybe_broadcast(
            links.join(
                cmap.withColumnRenamed("surface", "linked"), "linked"
            ).select("surface", "canonical_iri").localCheckpoint(eager=True)
        )
    t = mentions.join(
        composed.withColumnRenamed("surface", "subj_mention").withColumnRenamed(
            "canonical_iri", "subj"
        ),
        "subj_mention",
    )
    t = t.join(
        composed.withColumnRenamed("surface", "obj_mention").withColumnRenamed(
            "canonical_iri", "obj_iri"
        ),
        "obj_mention",
        "left",
    )
    obj = F.when(F.col("o_is_entity"), F.col("obj_iri")).otherwise(
        F.concat(F.lit('"'), F.col("obj_mention"), F.lit('"@en'))
    )
    return t.select("subj", "pred", obj.alias("obj"), "o_is_entity", "url").distinct()


def canonical_triples(
    linked: DataFrame, tau: float = 0.8, checkpoint_dir: str | None = None
) -> DataFrame:
    """linked surface triples -> canonical string triples
    (subj, pred, obj, o_is_entity, url) with reference lexical forms."""
    from gstored_spark.kg.link import maybe_broadcast

    # consumed by both the subject and the object join; localCheckpoint also
    # truncates the LSH+CC plan so the triple joins re-analyze a flat scan;
    # broadcast when small (checkpointed plans carry no size stats)
    cmap = maybe_broadcast(
        canonical_map(
            entity_surfaces(linked), tau=tau, checkpoint_dir=checkpoint_dir
        ).localCheckpoint(eager=True)
    )
    t = linked.join(
        cmap.withColumnRenamed("surface", "subj_surface").withColumnRenamed(
            "canonical_iri", "subj"
        ),
        "subj_surface",
    )
    t = t.join(
        cmap.withColumnRenamed("surface", "obj_surface").withColumnRenamed(
            "canonical_iri", "obj_iri"
        ),
        "obj_surface",
        "left",
    )
    obj = F.when(F.col("o_is_entity"), F.col("obj_iri")).otherwise(
        F.concat(F.lit('"'), F.col("obj_surface"), F.lit('"@en'))
    )
    return t.select(
        "subj", "pred", obj.alias("obj"), "o_is_entity", "url"
    ).distinct()
