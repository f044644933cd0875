"""Deterministic hash-based sampling for training-data pipelines.

`df.sample()` is seed-dependent per partition layout — rerunning after a
repartition or a resumed snapshot changes the sample, which poisons
dataset reproducibility. These operators decide membership from a HASH OF
THE ROW KEY alone, so the sample is:

  - stable under repartitioning, resume, and cluster size (pure column
    expression, no RNG state);
  - consistent across engines (md5 is everywhere — the DuckDB oracles
    reproduce the exact row set, hash-matched by the driver);
  - mergeable: the fraction-f sample of a union equals the union of
    fraction-f samples (membership is per-key, not per-batch).

All JVM-side column expressions (md5 + integer ops) — no UDF, no shuffle;
the filter pushes into the scan like any predicate. At 100 TB this is the
only sampling shape that works: a seeded RNG sample cannot be resumed or
audited, a hash sample can be re-derived row-for-row from the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 2^24 buckets: fraction resolution ~6e-8, and the 6-hex-digit slice of md5
# stays exactly representable everywhere (DuckDB, Spark, python)
_BUCKETS = 1 << 24


def hash_bucket(key, salt: str = "") -> "F.Column":
    """Uniform bucket in [0, 2^24) from md5 of the key (+ optional salt —
    distinct salts give independent samples over the same keys)."""
    return F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 6), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes under the fraction threshold."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    thr = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample dominant languages, keep all
    of rare ones): the threshold is a CASE expression over the stratum
    column — still a pure scan predicate, no join, no shuffle."""
    thr = F.lit(int(default * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0,1]")
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def mix_sources(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict,
    total_rows: int,
    salt: str = "mix",
) -> DataFrame:
    """Compose a training mix to TARGET PROPORTIONS: each source keeps a
    deterministic hash sample sized so the output approximates
    ``total_rows`` split by ``weights`` (sources absent from ``weights``
    drop). A source smaller than its target keeps everything (fraction
    caps at 1 — the standard under-supplied-source behavior; upsampling is
    a repeat policy, not a sampling one).

    The only driver-side work is the per-source count (one tiny groupBy
    collect — sources are few by construction); membership stays a pure
    hash predicate, so the mix inherits every determinism property of
    deterministic_sample (stable under repartition/resume, re-derivable
    row-for-row)."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wsum = float(sum(weights.values()))
    thr = None
    for src, w in sorted(weights.items()):
        n = counts.get(src, 0)
        frac = min(1.0, (total_rows * w / wsum) / n) if n else 0.0
        t = F.when(F.col(source_col) == src, F.lit(int(frac * _BUCKETS)))
        thr = t.otherwise(F.lit(0)) if thr is None else t.otherwise(thr)
    if thr is None:
        raise ValueError("weights must name at least one source")
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def train_holdout_split(
    df: DataFrame, key_col: str, holdout_fraction: float, salt: str = "split"
) -> DataFrame:
    """Adds a ``split`` column ('holdout' under the threshold else 'train').
    Key-hash assignment means a document NEVER migrates between splits as
    the corpus grows — the property that prevents train/test contamination
    across dataset versions."""
    thr = int(holdout_fraction * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(key_col), salt) < F.lit(thr), F.lit("holdout")
        ).otherwise(F.lit("train")),
    )
