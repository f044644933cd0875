"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (north rule: spark-submit --py-files on a multi-executor
cluster; resumable from snapshot checkpoints):

    zip -r gstored_spark.zip gstored_spark
    spark-submit --py-files gstored_spark.zip tools/submit_job.py \
        --input /data/documents_parquet --output /data/kg_out \
        --n-parts 1024 --resume

    # or with the built-in deterministic corpus (benchmarks):
    spark-submit --py-files gstored_spark.zip tools/submit_job.py \
        --gen-docs 1000000 --output /data/kg_out --n-parts 1024

On a cluster, master/executor sizing comes from spark-submit flags; this
script only builds the session via getOrCreate and never sets a master
unless SPARK_GRAFT_MASTER requests local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of documents(url, warc_ts, html, text, lang)")
    ap.add_argument("--gen-docs", type=int, default=0, help="generate N synthetic docs instead")
    ap.add_argument("--output", required=True, help="snapshot/output root")
    ap.add_argument("--n-parts", type=int, default=64, help="graph partitions")
    ap.add_argument("--resume", action="store_true", help="resume from existing stage snapshots")
    ap.add_argument("--salt-threshold", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from gstored_spark.kg.metrics import StageStore
    from gstored_spark.kg.pipeline import run_pipeline
    from gstored_spark.sources.corpus import generate_documents

    spark = SparkSession.builder.appName("gstored-kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.gen_docs:
        docs = generate_documents(spark, args.gen_docs)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --gen-docs is required")

    store = StageStore(spark, args.output, resume=args.resume)
    t0 = time.time()
    res = run_pipeline(
        spark, docs, n_parts=args.n_parts, store=store,
        salt_threshold=args.salt_threshold,
        canon_checkpoint_dir=os.path.join(args.output, "_cc_checkpoints"),
    )
    n = res.id_triples.count()
    wall = time.time() - t0
    summary = dict(
        triples=n,
        adjacency_rows=res.adjacency.count(),
        partitions=args.n_parts,
        wall_sec=round(wall, 2),
        triples_per_sec=round(n / wall, 2) if wall else None,
        output=args.output,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
