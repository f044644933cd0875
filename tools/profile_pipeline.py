"""Per-stage wall-time profile of the KG pipeline at a given parallelism.

Mirrors kg/pipeline.run_pipeline but forces each stage eagerly and times it,
so the scaling bottleneck is attributable to a stage instead of a lump sum.

Usage: python tools/profile_pipeline.py <cpus> <n_docs>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from gstored_spark.session import get_spark
    from gstored_spark.sources.corpus import generate_documents
    from gstored_spark.kg import blocks as B
    from gstored_spark.kg import canon as C
    from gstored_spark.kg import extract as E
    from gstored_spark.kg import ids as I
    from gstored_spark.kg import partition as P
    from gstored_spark.kg import triples as Tr

    spark = get_spark("profile", cores=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_documents(spark, n_docs, parallelism=max(cpus * 2, 16)).persist()
    docs.count()

    times: dict[str, float] = {}

    from pyspark.storagelevel import StorageLevel

    def stage(name, df):
        t0 = time.time()
        # same storage policy as kg/pipeline.run_pipeline: serialized +
        # spark.rdd.compress blocks
        out = df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        times[name] = round(time.time() - t0, 2)
        print(f"{name:24s} {times[name]:8.2f}s", flush=True)
        return out

    t_all = time.time()
    extracted = stage("extract", E.extracted(docs))
    mentions = stage("mentions", Tr.mention_triples(extracted))
    from gstored_spark.kg.pipeline import release_checkpoint

    docs.unpersist()  # caller-persisted input: CacheManager path works
    release_checkpoint(extracted)

    # canonicalization broken into sub-steps
    from gstored_spark.kg.link import alias_dictionary, link_surfaces, maybe_broadcast
    from pyspark.sql import functions as F

    t0 = time.time()
    aliases = alias_dictionary(mentions)
    surfaces = (
        mentions.select(F.col("subj_mention").alias("surface"))
        .unionAll(mentions.filter("o_is_entity").select(F.col("obj_mention").alias("surface")))
        .distinct()
    )
    links = link_surfaces(surfaces, aliases).localCheckpoint(eager=True)
    times["link_surfaces"] = round(time.time() - t0, 2)
    print(f"{'link_surfaces':24s} {times['link_surfaces']:8.2f}s n={links.count()}", flush=True)

    t0 = time.time()
    linked_names = links.select(F.col("linked").alias("surface")).distinct()
    cmap = C.canonical_map(linked_names).localCheckpoint(eager=True)
    times["canonical_map"] = round(time.time() - t0, 2)
    print(f"{'canonical_map':24s} {times['canonical_map']:8.2f}s n={cmap.count()}", flush=True)

    t0 = time.time()
    composed = maybe_broadcast(
        links.join(cmap.withColumnRenamed("surface", "linked"), "linked")
        .select("surface", "canonical_iri")
        .localCheckpoint(eager=True)
    )
    t = mentions.join(
        composed.withColumnRenamed("surface", "subj_mention").withColumnRenamed("canonical_iri", "subj"),
        "subj_mention",
    ).join(
        composed.withColumnRenamed("surface", "obj_mention").withColumnRenamed("canonical_iri", "obj_iri"),
        "obj_mention",
        "left",
    )
    obj = F.when(F.col("o_is_entity"), F.col("obj_iri")).otherwise(
        F.concat(F.lit('"'), F.col("obj_mention"), F.lit('"@en'))
    )
    triples = stage(
        "apply_canon+distinct",
        t.select("subj", "pred", obj.alias("obj"), "o_is_entity", "url").distinct(),
    )
    release_checkpoint(mentions)

    t0 = time.time()
    entity_dict, literal_dict, pred_dict = I.build_dictionaries(triples)
    entity_dict = entity_dict.localCheckpoint(eager=True)
    literal_dict = literal_dict.localCheckpoint(eager=True)
    times["dictionaries"] = round(time.time() - t0, 2)
    print(f"{'dictionaries':24s} {times['dictionaries']:8.2f}s", flush=True)

    id_triples = stage("encode_triples", I.encode_triples(triples, entity_dict, literal_dict, pred_dict))
    routed = stage("route", P.route_triples(id_triples, 16))
    internal = stage("internal", P.internal_vertices(routed, 16))
    hot = P.hot_subjects(routed, 100_000)
    salted = P.salted_shuffle_key(routed, hot)
    adj = stage("adjacency", B.adjacency(salted, internal, salt_col="salt"))
    sigs = stage("signatures", B.vertex_signatures_from_ids(id_triples, entity_dict, literal_dict))
    part_sigs = B.partitioned_signatures(sigs, internal)
    part_sig = stage("part_sig", B.partition_signature(part_sigs))

    total = round(time.time() - t_all, 2)
    n = id_triples.count()
    print(json.dumps(dict(cpus=cpus, docs=n_docs, triples=n, total=total,
                          tps=round(n / total, 1), stages=times)))
    spark.stop()


if __name__ == "__main__":
    main()
