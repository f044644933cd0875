"""Per-stage, per-partition metrics + resumable snapshot checkpoints.

Every pipeline stage writes its output as a parquet snapshot under
``<root>/<stage>/`` together with a ``_manifest.json`` (row count, schema,
wall-clock, input snapshot ids) and appends per-partition metric rows to
``<root>/_metrics/``. A rerun (``resume=True``) that finds a valid manifest
reads the snapshot instead of recomputing — the sandbox stand-in for
Iceberg snapshot checkpoints the north rule requires (same contract:
atomic-by-rename manifest written after data, readable lineage).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage string, part int, rows long, wall_ms long, snapshot_id string, run_ts string"
)


class StageStore:
    def __init__(self, spark: SparkSession, root: str, resume: bool = True):
        self.spark = spark
        self.root = root
        self.resume = resume
        os.makedirs(root, exist_ok=True)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_manifest.json")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def has(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._data_path(stage))

    def materialize(
        self, stage: str, df: DataFrame, part_col: str | None = None
    ) -> DataFrame:
        """Write stage output + manifest + metrics; return the re-read
        DataFrame (so downstream lineage starts at the snapshot). With
        ``resume`` and an existing manifest, skips the compute entirely."""
        if self.resume and self.has(stage):
            return self.read(stage)
        t0 = time.time()
        path = self._data_path(stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        wall_ms = int((time.time() - t0) * 1000)
        snapshot_id = f"{stage}-{int(t0)}"
        if part_col and part_col in out.columns:
            per_part = out.groupBy(F.col(part_col).alias("part")).agg(
                F.count(F.lit(1)).alias("rows")
            )
        else:
            per_part = out.groupBy(F.lit(-1).alias("part")).agg(
                F.count(F.lit(1)).alias("rows")
            )
        run_ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        metrics = per_part.select(
            F.lit(stage).alias("stage"),
            F.col("part").cast("int"),
            F.col("rows").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(snapshot_id).alias("snapshot_id"),
            F.lit(run_ts).alias("run_ts"),
        )
        metrics.write.mode("append").parquet(os.path.join(self.root, "_metrics"))
        total = out.count()
        manifest = dict(
            stage=stage,
            snapshot_id=snapshot_id,
            rows=total,
            schema=out.schema.jsonValue(),
            wall_ms=wall_ms,
            run_ts=run_ts,
        )
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(stage))
        return out

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))
