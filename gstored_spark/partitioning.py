"""Scan-parallelism guard for compute-heavy operators.

A parquet row group is an unsplittable input unit: a table stored as one
small file with one row group scans as ONE task no matter how many cores
the session has, and every downstream map-side stage (shingling, n-gram
generation, Arrow UDF batches, matmul blocks) inherits that parallelism.
At production scale inputs have thousands of splits and this guard is a
no-op; on a parallelism-deficient scan it inserts one round-robin
repartition so per-row compute spreads across the executor.

Only operators whose per-row work dominates the cost of shuffling their
(narrow) input should call this — for pure column-projection queries the
added exchange would cost more than the serial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _effective_scan_parallelism(df: DataFrame, want: int) -> int:
    """Upper bound on the scan's REAL parallelism. The scheduler may carve
    a small parquet file into many byte-range splits, but a row group is
    the smallest splittable unit — splits without a row-group midpoint
    read nothing, so a one-row-group file computes in one task no matter
    how many partitions the RDD reports. Driver cost is bounded: footers
    are only inspected when the file count is already below ``want`` (at
    production split counts the file listing alone proves sufficiency)."""
    try:
        files = df.inputFiles()
    except Exception:
        return want
    if len(files) >= want:
        return want
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            path = f[7:] if f.startswith("file://") else (
                f[5:] if f.startswith("file:") else f
            )
            if not path.endswith(".parquet"):
                return want
            total += pq.ParquetFile(path).num_row_groups
            if total >= want:
                return want
        return total
    except Exception:
        return want


def spread_scan(
    df: DataFrame, min_parts: int | None = None, barrier: bool = False
) -> DataFrame:
    """Repartition ``df`` to the session's parallelism iff its physical
    plan currently has fewer usable partitions (RDD partition count capped
    by the input's row-group count). Result sets of all callers are
    partitioning-independent.

    ``barrier=True`` pins the exchange with a lazy localCheckpoint: the
    optimizer pushes downstream *scalar* projections below a bare
    Repartition (Generate/Python-eval nodes stay above), which would put
    the heavy per-row compute right back onto the deficient scan tasks —
    measured 36 s vs 1.5 s for the minhash shingle chain at sf1.0. Callers
    set it when the work after the spread is scalar JVM expressions; the
    checkpoint caches only the narrow input projection."""
    spark = df.sparkSession
    want = min_parts or spark.sparkContext.defaultParallelism
    try:
        have = min(df.rdd.getNumPartitions(), _effective_scan_parallelism(df, want))
    except Exception:
        return df
    if have < want:
        out = df.repartition(want)
        if barrier:
            out = out.localCheckpoint(eager=False)
        return out
    return df
