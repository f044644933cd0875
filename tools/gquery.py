"""gquery/gqueryD console analog: answer a SPARQL query file from an
emitted store directory.

The reference's user-facing query entrypoints load a built database and
evaluate a query file against it (Main/gquery.cpp console; distributed
Main/gqueryD.cpp:108-265 reads the query text, parses, and answers out of
the loaded partitioned store). The PySpark-native equivalent:

    python tools/gquery.py /path/to/artifact query.sparql
    python tools/gquery.py /path/to/artifact -e 'SELECT ?s ?o WHERE { ?s <p> ?o }'
    python tools/gquery.py /path/to/artifact -e 'ASK { ... }' --assembled

``--assembled`` answers leaf BGPs by partial-evaluation-and-assembly
(kg.match.match_partitioned — the gqueryD fragment lifecycle) instead of
the signature-pruned store matcher; results are identical.

Output: one TSV row per solution (header = projected vars), row count and
wall time on stderr — the shape of the reference console's answer dump
(Main/gquery.cpp result print loop).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("artifact", help="emitted store directory (write_artifact output)")
    ap.add_argument("query", nargs="?", help="SPARQL query file")
    ap.add_argument("-e", "--expr", help="inline SPARQL text instead of a file")
    ap.add_argument("--assembled", action="store_true",
                    help="partial-evaluation-and-assembly leaf matching")
    ap.add_argument("--limit", type=int, default=0,
                    help="print at most N rows (0 = all)")
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] session (0 = getOrCreate default)")
    args = ap.parse_args()

    if bool(args.query) == bool(args.expr):
        ap.error("exactly one of <query file> / -e is required")
    text = args.expr if args.expr else open(args.query).read()

    if args.cores:
        from gstored_spark.session import get_spark

        spark = get_spark("gquery", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("gquery").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gstored_spark.kg.blocks import GraphArtifact
    from gstored_spark.plans.sparql import run_sparql_over_artifact

    t0 = time.time()
    art = GraphArtifact(spark, args.artifact)
    df = run_sparql_over_artifact(art, text, assembled=args.assembled)
    rows = df.collect() if not args.limit else df.limit(args.limit).collect()
    wall = time.time() - t0

    print("\t".join(df.columns))
    for r in rows:
        print("\t".join("" if v is None else str(v) for v in r))
    print(f"[gquery] {len(rows)} row(s) in {wall:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
