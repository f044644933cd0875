"""Stage 5: dictionary encoding — dense int IDs in three namespaces.

Mirrors the reference's ID allocation (Database/Database.cpp:1444-1504):
entities get [0, 10^9), literals [10^9, 2*10^9) (LITERAL_FIRST_ID,
Util/Util.h:184-186 — "a literal is distinguished from an entity purely by
ID range", Database.cpp:3889-3894), predicates a separate small namespace
that is **broadcast** (predicate count is tiny relative to terms — the same
assumption behind the reference's 5-interval predicate encoding,
Signature/Signature.h:33-35).

Dense-ID assignment must be deterministic at ANY parallelism (SURVEY §7
hard-part 1), so it is *position in the global sort order*:
  repartitionByRange(term) -> sortWithinPartitions(term)
  -> per-partition counts -> cumulative offsets (driver, #partitions rows)
  -> offset + local row index via one mapInPandas pass.
Range boundaries may vary with sampling/parallelism, but the global order —
and therefore every assigned ID — does not. This is the Spark-native
replacement for a single-window row_number() (which would serialize through
one task) and for monotonically_increasing_id (which is not deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

LITERAL_FIRST_ID = 1000 * 1000 * 1000  # Util/Util.h:184-186


def assign_dense_ids(
    terms: DataFrame, col: str, offset: int = 0, buckets: int | None = None,
    dtype: str = "string",
) -> DataFrame:
    """terms (one column of ``dtype``, assumed distinct) -> (col, id) with
    ids offset..offset+n-1 assigned in ascending sort order."""
    spark = terms.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    srt = (
        terms.select(col)
        .repartitionByRange(buckets, F.col(col))
        .sortWithinPartitions(col)
        .withColumn("_pid", F.spark_partition_id())
    )
    srt = srt.persist()
    try:
        counts = {
            r["_pid"]: r["n"]
            for r in srt.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        offsets: dict[int, int] = {}
        acc = offset
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nxt = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                if nxt is None:
                    nxt = offsets[pid]
                ids = range(nxt, nxt + len(pdf))
                nxt += len(pdf)
                out = pd.DataFrame({col: pdf[col].values, "id": list(ids)})
                yield out

        out = srt.mapInPandas(number, schema=f"{col} {dtype}, id long")
        # materialize before unpersist so the upstream sort runs exactly once
        out = out.localCheckpoint(eager=True)
    finally:
        srt.unpersist()
    return out


def assign_dense_ids_2ns(
    terms: DataFrame, buckets: int | None = None, distinct: bool = True
) -> DataFrame:
    """terms(ns int in {0,1}, term) distinct -> (ns, term, id): namespace 0
    numbered from 0, namespace 1 from LITERAL_FIRST_ID — one range shuffle
    for both dictionaries instead of two separate assignment passes.

    ``distinct=False`` accepts a NON-distinct term stream and dedupes
    INSIDE the range partitions: equal (ns, term) keys colocate under range
    partitioning, so a per-partition aggregate is a global distinct — the
    caller's separate hash-distinct shuffle over the full term stream
    folds into the range exchange this assigner needs anyway (guide §2.4
    "two operations keyed the same way can share one exchange")."""
    spark = terms.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    srt = terms.select("ns", "term").repartitionByRange(
        buckets, F.col("ns"), F.col("term")
    )
    if not distinct:
        srt = srt.dropDuplicates(["ns", "term"])
    srt = srt.sortWithinPartitions("ns", "term").withColumn(
        "_pid", F.spark_partition_id()
    )
    srt = srt.persist()
    try:
        counts: dict[tuple[int, int], int] = {
            (r["_pid"], r["ns"]): r["n"]
            for r in srt.groupBy("_pid", "ns").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        base = {0: 0, 1: LITERAL_FIRST_ID}
        offsets: dict[tuple[int, int], int] = {}
        for ns in (0, 1):
            acc = base[ns]
            for pid in sorted(p for (p, n) in counts if n == ns):
                offsets[(pid, ns)] = acc
                acc += counts[(pid, ns)]

        def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nxt: dict[int, int] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                ids = []
                for ns in pdf["ns"]:
                    ns = int(ns)
                    if ns not in nxt:
                        nxt[ns] = offsets[(pid, ns)]
                    ids.append(nxt[ns])
                    nxt[ns] += 1
                yield pd.DataFrame({"ns": pdf["ns"].values, "term": pdf["term"].values, "id": ids})

        out = srt.mapInPandas(number, schema="ns int, term string, id long")
        out = out.localCheckpoint(eager=True)
    finally:
        srt.unpersist()
    return out


def build_dictionaries(triples: DataFrame, buckets: int | None = None):
    """canonical triples -> (entity_dict, literal_dict, pred_dict DataFrames).

    entity ids in [0, 1e9), literal ids in [1e9, 2e9), predicate ids dense
    from 0 in their own namespace."""
    entities = (
        triples.select(F.col("subj").alias("term"))
        .unionAll(triples.filter("o_is_entity").select(F.col("obj").alias("term")))
        .withColumn("ns", F.lit(0))
    )
    literals = (
        triples.filter(~F.col("o_is_entity"))
        .select(F.col("obj").alias("term"))
        .withColumn("ns", F.lit(1))
    )
    # the tiny predicate collect is its own job over the triple stream —
    # run it concurrently with the assigner's jobs instead of after them
    from concurrent.futures import ThreadPoolExecutor

    preds = triples.select(F.col("pred").alias("term")).distinct()
    with ThreadPoolExecutor(max_workers=1) as pool:
        f_preds = pool.submit(lambda: sorted(r["term"] for r in preds.collect()))
        # term streams go in NON-distinct: the assigner dedupes inside its
        # range partitions, saving the separate hash-distinct shuffle
        both = assign_dense_ids_2ns(
            entities.unionByName(literals), buckets, distinct=False
        )
        pred_terms = f_preds.result()
    entity_dict = both.filter("ns = 0").select("term", "id")
    literal_dict = both.filter("ns = 1").select("term", "id")
    spark = triples.sparkSession
    pred_dict = spark.createDataFrame(
        [(t, i) for i, t in enumerate(pred_terms)], schema="term string, id long"
    )
    return entity_dict, literal_dict, pred_dict


def encode_triples(
    triples: DataFrame,
    entity_dict: DataFrame,
    literal_dict: DataFrame,
    pred_dict: DataFrame,
) -> DataFrame:
    """-> id_triples(s long, p long, o long, o_is_entity boolean).

    Predicate dictionary is broadcast; term dictionaries join on the term
    (broadcast when small enough, else shuffle joins — both sides
    hash-partition on the term)."""
    from gstored_spark.kg.link import maybe_broadcast

    term_dict = maybe_broadcast(entity_dict.unionByName(literal_dict))
    t = triples.join(
        term_dict.withColumnRenamed("term", "subj").withColumnRenamed("id", "s"), "subj"
    )
    t = t.join(F.broadcast(pred_dict.withColumnRenamed("term", "pred").withColumnRenamed("id", "p")), "pred")
    t = t.join(
        term_dict.withColumnRenamed("term", "obj").withColumnRenamed("id", "o"), "obj"
    )
    return t.select("s", "p", "o", "o_is_entity")


def decode_ids(df: DataFrame, id_col: str, term_dict: DataFrame, out_col: str) -> DataFrame:
    """id -> string materialization (the StringIndex analog,
    StringIndex/StringIndex.h:15-116): a join against the dictionary."""
    d = term_dict.select(
        F.col("id").alias(id_col), F.col("term").alias(out_col)
    )
    return df.join(d, id_col)
