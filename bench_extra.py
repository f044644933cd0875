"""Per-query isolation harness for the optimization round (guide §1.4).

NOT the graded bench (bench.py is frozen): this tool times individual
declared queries with the same methodology (.count(), same session sizing),
optionally captures .explain("formatted") to plans/r06/<query>_<tag>.txt,
and can repeat queries for warm-vs-cold comparisons.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries bgp_triangle,ann_topk \
      --repeat 2 --explain --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from gstored_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--artifact", action="store_true", help="time _graph_artifact build")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("bench_extra", cores=args.cpus, shuffle_partitions=max(3 * args.cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")  # match bench.py query leg
    qs = {**E.queries(), **E.extra_queries()}
    out: dict[str, list[float]] = {}

    if args.artifact:
        t0 = time.time()
        E._graph_artifact(spark, args.sf)
        out["artifact_build"] = [round(time.time() - t0, 3)]
        print(json.dumps({"artifact_build": out["artifact_build"]}), flush=True)

    names = [q for q in args.queries.split(",") if q]
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            n = df.count()
            dt = round(time.time() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(json.dumps({"query": name, "run": i, "sec": dt, "rows": n}), flush=True)
        if args.explain:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({"sf": args.sf, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
