"""Stage checkpoints with per-partition lineage + metrics manifests.

The reference gets durability for free because every stage writes a
Snowflake table (Orchestrate_Demo.py stage boundaries). This module
formalizes that: each stage writes parquet + a JSON manifest holding
row count, schema, per-partition row counts (lineage), and the
upstream fingerprint. ``resume`` skips stages whose manifest matches —
kill the job after stage k, rerun, and stages 1..k are read back
instead of recomputed (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_STAGE_MANIFEST.json"


class StageCheckpointer:
    def __init__(self, spark: SparkSession, root: str, pipeline_fingerprint: str = ""):
        self.spark = spark
        self.root = root
        self.fingerprint = pipeline_fingerprint
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), MANIFEST_NAME)

    def is_complete(self, stage: str) -> bool:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return False
        with open(path) as f:
            m = json.load(f)
        return m.get("complete", False) and m.get("pipeline_fingerprint") == self.fingerprint

    def write(self, df: DataFrame, stage: str) -> DataFrame:
        """Materialize a stage: parquet + manifest; returns the re-read
        DataFrame (truncated lineage, stable for downstream stages)."""
        out = self._stage_dir(stage)
        df.write.mode("overwrite").parquet(out)
        back = self.spark.read.parquet(out)
        per_part = (
            back.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .orderBy("partition_id")
            .collect()
        )
        manifest = {
            "stage": stage,
            "complete": True,
            "pipeline_fingerprint": self.fingerprint,
            "rows": int(sum(r["rows"] for r in per_part)),
            "n_partitions": len(per_part),
            "partition_lineage": {str(r["partition_id"]): int(r["rows"]) for r in per_part},
            "schema": back.schema.jsonValue(),
            "written_at": time.time(),
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=2)
        return back

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    def run_stage(self, stage: str, compute) -> DataFrame:
        """Resume-or-compute: if the stage's manifest is complete (and
        from the same pipeline config), read it back; else compute,
        checkpoint, and return."""
        if self.is_complete(stage):
            return self.read(stage)
        return self.write(compute(), stage)

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)
