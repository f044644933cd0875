"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): end-to-end KG-construction throughput in
triples/sec — synthetic Common-Crawl-style corpus (sources/corpus.py,
generated distributedly, excluded from the timed window) through
extract -> triples -> link -> LSH+CC canon -> ids -> partition ->
adjacency+signatures, forced by materializing the adjacency blocks and
partition signatures.

Also times the headline operator queries from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_DOCS  corpus size for the pipeline leg (default 4000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from gstored_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 200k docs: large enough that the pipeline's fixed coordination cost
# (~30 s of planning/fixpoint jobs, see BENCH/BASELINE.md) stops dominating
# the headline triples/sec; still ~1 min at local[32]
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))

# headline operator queries (forced via count) — chosen to cover the join,
# dedup, similarity, text and CC families at sf scale
QUERY_NAMES = [
    "multi_join",
    "filter_pushdown",
    "bgp_triangle",
    "bgp_blocks_triangle",
    "bgp_assembly",
    "bgp_ask_blocks",
    "bgp_star",
    "bgp_parsed",
    "path_seq",
    "sparql_groupby",
    "sparql_subselect",
    "construct_graph",
    "sparql_blocks",
    "modify_where",
    "term_funcs",
    "delete_where",
    "groupcc",
    "exact_dedup",
    "minhash_dedup",
    "simhash",
    "ngram_jaccard",
    "ann_topk",
    "cosine_dedup",
    "embed_text",
    "winnow",
    "lang_id",
    "quality_score",
    "repetition",
    "pii_redact",
    "url_normalize",
    "sample_strata",
    "token_count",
    "order_limit",
    "dict_encode",
    # round-5 additions (absent from BENCH_r0{1..4}.json)
    "sparql_assembled",
    "distinct_order_limit",
    "asof_join",
    "decontaminate",
    "tok_freq",
]


def _steal_busy() -> tuple[float, float]:
    """(hypervisor steal, user+nice busy) seconds from /proc/stat. Steal is
    THE confounder on this shared VM (a 2026-08-19 scaling leg lost 33% of
    its wall clock to steal in an otherwise idle window); recording it per
    bench run lets a reader judge the window without a separate harness."""
    try:
        v = list(map(int, open("/proc/stat").readline().split()[1:9]))
        return v[7] / 100.0, (v[0] + v[1]) / 100.0
    except Exception:
        return float("nan"), float("nan")


def main():
    spark = get_spark(
        "bench", cores=CPUS, shuffle_partitions=max(3 * CPUS, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")
    # some benchmarked variants were retired from the driver's graded
    # window (see README "driver grading window") but stay benchmarked for
    # round-over-round comparability
    qs = {**E.queries(), **E.extra_queries()}
    timings: dict[str, float] = {}

    # --- KG pipeline leg -----------------------------------------------
    from gstored_spark.kg.pipeline import run_pipeline
    from gstored_spark.sources.corpus import generate_documents

    docs = generate_documents(spark, N_DOCS).persist()
    n_docs = docs.count()  # corpus generation excluded from the timed window

    # n_parts is a property of the output graph layout, held constant across
    # parallelism levels so local[8] vs local[32] run the *same job*
    steal0, busy0 = _steal_busy()
    t0 = time.time()
    res = run_pipeline(spark, docs, n_parts=16, release_input=True)
    n_triples = res.id_triples.count()
    n_adj = res.adjacency.count()
    n_psig = res.part_sig.count()
    pipeline_sec = time.time() - t0
    steal1, busy1 = _steal_busy()
    triples_per_sec = n_triples / pipeline_sec if pipeline_sec > 0 else 0.0
    timings["kg_pipeline"] = round(pipeline_sec, 3)

    # --- operator queries ------------------------------------------------
    # right-size the query leg: 3x-cores shuffle partitions are pipeline
    # sizing; the operator queries run on sf-scale inputs where that many
    # reducers is pure coordination (round-2 regression: minhash_dedup on
    # 500 docs went 10 s -> 28 s under 96 partitions). Runtime-settable,
    # so the pipeline leg above keeps its own sizing.
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    # build the on-disk graph artifact once, untimed (store construction is
    # the pipeline leg's job; bgp_blocks_triangle measures QUERYING the store)
    t0 = time.time()
    E._graph_artifact(spark, SF_DIR)
    timings["artifact_build"] = round(time.time() - t0, 3)

    for name in QUERY_NAMES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "kg_construct_triples_per_sec",
        "value": round(triples_per_sec, 2),
        "unit": "triples/sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs": n_docs,
        "triples": n_triples,
        "adjacency_rows": n_adj,
        "partitions": n_psig,
        "pipeline_sec": round(pipeline_sec, 3),
        "pipeline_steal_s": round(steal1 - steal0, 1),
        "pipeline_host_busy_s": round(busy1 - busy0, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
