"""Per-stage wall-time profile of _graph_artifact (the bench's
artifact_build leg): dictionary build, triple encode, routing, adjacency,
signatures, store write — so the 100x-scale bottleneck is attributable.

Usage: python tools/profile_artifact.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from gstored_spark.session import get_spark
    from gstored_spark.kg import blocks as B
    from gstored_spark.kg import ids as I
    from gstored_spark.kg import partition as P
    from gstored_spark.kg.pipeline import PipelineResult

    spark = get_spark("profile_artifact", cores=cpus, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(f"{label:28s} {time.time() - t0:8.2f}s", flush=True)
        return out

    n_parts = 8
    triples = E._graph_triples(spark, sf).withColumn("o_is_entity", F.lit(True))
    t("warmup count", lambda: triples.count())
    dicts = t("build_dictionaries", lambda: I.build_dictionaries(triples))
    entity_dict, literal_dict, pred_dict = dicts
    id_triples = t(
        "encode_triples(chk)",
        lambda: I.encode_triples(triples, entity_dict, literal_dict, pred_dict)
        .localCheckpoint(eager=True),
    )
    routed = t("route_triples(chk)", lambda: P.route_triples(id_triples, n_parts).localCheckpoint(eager=True))
    internal = t("internal_vertices(chk)", lambda: P.internal_vertices(routed, n_parts).localCheckpoint(eager=True))
    adj = t("adjacency(chk)", lambda: B.adjacency(routed, internal).localCheckpoint(eager=True))
    sigs = t(
        "signatures(chk)",
        lambda: B.vertex_signatures_from_ids(id_triples, entity_dict, literal_dict)
        .localCheckpoint(eager=True),
    )
    part_sig = t(
        "part_sig(chk)",
        lambda: B.partition_signature(B.partitioned_signatures(sigs, internal))
        .localCheckpoint(eager=True),
    )
    res = PipelineResult(
        triples=triples, entity_dict=entity_dict, literal_dict=literal_dict,
        pred_dict=pred_dict, id_triples=id_triples, routed=routed,
        internal=internal, adjacency=adj, signatures=sigs, part_sig=part_sig,
    )
    out = "/tmp/profile_artifact_out"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    t("write_artifact", lambda: B.write_artifact(res, out))
    spark.stop()


if __name__ == "__main__":
    main()
