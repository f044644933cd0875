"""Stage 3: mention detection + candidate entity-link scoring.

Mentions come from the triple extractor; this stage resolves each distinct
surface form against a broadcast alias dictionary (built from the corpus's
own name statements — the web analog of anchor-text dictionaries) with a
deterministic top-1 score:

  score(mention, candidate) = char-3-gram Jaccard, tie-break candidate asc.

Scale shape: scoring joins the *distinct surface forms* (tiny vs. the
mention stream) against the dictionary on a lowercase blocking key, so the
expensive string math runs once per surface form, not once per mention; the
dictionary broadcast is ADAPTIVE (maybe_broadcast) — aliases are
O(distinct name statements) ~ O(entities), so at web scale the hint is
withheld and Catalyst shuffle-joins on the blocking key instead (unlike
predicates, which are genuinely small, Signature/Signature.cpp:56-61).
No Python: Jaccard on char-3-gram arrays is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.operators.dedup import char_shingles
from gstored_spark.sources.corpus import PRED_NAME


def maybe_broadcast(
    df: DataFrame,
    limit_bytes: int = 64 << 20,
    limit_rows: int = 5_000_000,
    sample_rows: int = 256,
) -> DataFrame:
    """Broadcast hint iff the side is small IN BYTES, not just rows.

    The explicit F.broadcast hint BYPASSES Spark's own 64 MB
    autoBroadcastJoinThreshold (session.py), so this probe must enforce an
    equivalent bound itself: 5M short alias rows broadcast fine, 5M
    long-document rows are hundreds of MB and must shuffle-join instead.

    Probe shape (bounded at any scale): a limit-count — CollectLimit stops
    scanning once limit_rows+1 rows are seen, so at web scale it
    short-circuits after a partition or two — then a ``sample_rows``
    driver-side sample to estimate average serialized row width;
    estimated total = rows x avg width against ``limit_bytes``."""
    probe = df.limit(limit_rows + 1).count()
    if probe > limit_rows:
        return df
    if probe == 0:
        return F.broadcast(df)
    sample = df.limit(sample_rows).collect()

    def row_bytes(row) -> int:
        total = 16  # per-row object overhead
        for v in row:
            if v is None:
                continue
            if isinstance(v, str):
                total += 8 + 2 * len(v)  # JVM UTF-16-ish resident width
            elif isinstance(v, (bytes, bytearray)):
                total += 8 + len(v)
            elif isinstance(v, (list, tuple)):
                total += 16 + 8 * len(v)
            else:
                total += 8
        return total

    est = probe * (sum(row_bytes(r) for r in sample) / len(sample))
    return F.broadcast(df) if est <= limit_bytes else df


def light_norm(col) -> "F.Column":
    """Lowercase + collapse whitespace. Deliberately weaker than full
    normalization — hyphen/initial variants survive so canonicalization has
    real work to do."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def alias_dictionary(mention_triples: DataFrame) -> DataFrame:
    """(alias, canonical): aliases observed via name statements — the
    surface form that *stated* the name maps to the stated canonical name —
    plus the identity alias of each canonical name."""
    names = mention_triples.filter(F.col("pred") == PRED_NAME)
    # one scan, not two: the union-of-selects shape read the (large) mention
    # stream once per branch; emitting both alias rows per name statement
    # from a single pass halves the stream scan feeding the distinct
    # (guide §2.3 "aggregate before you shuffle" — the shuffle itself is
    # unchanged, only the map side is)
    pairs = names.select(
        F.explode(
            F.array(
                F.struct(
                    light_norm(F.col("subj_mention")).alias("alias"),
                    F.col("obj_mention").alias("canonical"),
                ),
                F.struct(
                    light_norm(F.col("obj_mention")).alias("alias"),
                    F.col("obj_mention").alias("canonical"),
                ),
            )
        ).alias("ac")
    ).select("ac.alias", "ac.canonical")
    return pairs.distinct()


def link_surfaces(
    surfaces: DataFrame, aliases: DataFrame, checkpoint_aliases: bool = True
) -> DataFrame:
    """surfaces(surface) -> (surface, linked): dictionary hit replaces the
    surface with its canonical name; misses keep the surface. Top-1 among
    competing candidates by (jaccard desc, canonical asc).

    The dictionary is materialized once (checkpoint), then broadcast only
    when actually small — the probe and the join both reuse the
    materialized blocks instead of recomputing the distinct. Callers that
    already materialized ``aliases`` pass ``checkpoint_aliases=False``."""
    # shingles are computed ONCE PER SIDE before the join (once per distinct
    # surface / once per dictionary alias), not four times per candidate
    # pair inside the score expression — the interpreted higher-order
    # transform is the expensive part of the whole stage
    s = surfaces.select(
        "surface",
        light_norm(F.col("surface")).alias("alias"),
        char_shingles(F.col("surface")).alias("sh_s"),
    )
    a = aliases.select(
        "alias", "canonical", char_shingles(F.col("canonical")).alias("sh_c")
    )
    if checkpoint_aliases:
        a = a.localCheckpoint(eager=True)
    joined = s.join(maybe_broadcast(a), "alias", "left")
    scored = joined.withColumn(
        "jaccard",
        F.when(F.col("canonical").isNull(), F.lit(-1.0)).otherwise(
            F.size(F.array_intersect("sh_s", "sh_c"))
            / F.size(F.array_union("sh_s", "sh_c"))
        ),
    )
    # top-1 by (jaccard desc, canonical asc) as a hash aggregation with
    # map-side partial combine (min_by over an ordering struct) — the
    # row_number window this replaces sorted every candidate row after a
    # full shuffle. The -1.0 dictionary-miss sentinel can never tie a real
    # candidate (exact Jaccard is >= 0), so the '' placeholder in the
    # ordering struct never decides between a hit and a miss.
    best = scored.groupBy("surface").agg(
        F.min_by(
            F.coalesce("canonical", "surface"),
            F.struct(
                (-F.col("jaccard")).alias("nj"),
                F.coalesce("canonical", F.lit("")).alias("c"),
            ),
        ).alias("linked")
    )
    return best.select("surface", "linked")


def linked_triples(mention_triples: DataFrame) -> DataFrame:
    """mention triples -> triples with linked subject/object surfaces.
    Literals (o_is_entity = false) pass through untouched."""
    aliases = alias_dictionary(mention_triples)
    surfaces = (
        mention_triples.select(F.col("subj_mention").alias("surface"))
        .unionAll(
            mention_triples.filter("o_is_entity").select(
                F.col("obj_mention").alias("surface")
            )
        )
        .distinct()
    )
    links = link_surfaces(surfaces, aliases).localCheckpoint(eager=True)
    # checkpointed plans lose size statistics, so Catalyst would sort-merge
    # these joins and shuffle the big mention stream twice; hint broadcast
    # when the surface map is actually small (adaptive — at web scale the
    # map outgrows the limit and the hint is withheld)
    links = maybe_broadcast(links)
    t = mention_triples.join(
        links.withColumnRenamed("surface", "subj_mention")
        .withColumnRenamed("linked", "subj_linked"),
        "subj_mention",
    )
    t = t.join(
        links.withColumnRenamed("surface", "obj_mention")
        .withColumnRenamed("linked", "obj_linked"),
        "obj_mention",
        "left",
    )
    return t.select(
        F.col("subj_linked").alias("subj_surface"),
        "pred",
        F.when(F.col("o_is_entity"), F.col("obj_linked"))
        .otherwise(F.col("obj_mention"))
        .alias("obj_surface"),
        "o_is_entity",
        "url",
    )
