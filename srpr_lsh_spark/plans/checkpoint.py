"""Checkpoint warehouse: stage materialization, resume, per-partition lineage.

Generalizes the reference's parameter-keyed preprocessing cache
(``src/DataManager.h:47-67``: compute-or-load keyed by config, validated on
load with a recompute fallback, ``src/MatrixFactorization.h:129-141``) into a
per-stage table store:

- each stage writes parquet to ``{root}/{stage}`` via a temp-dir + atomic
  rename, then a ``_manifest.json`` (config hash, row count, schema) is
  written LAST — a crash at any point leaves either the old complete stage or
  an incomplete one that will recompute; never a half-read.
- on resume, a stage with a manifest whose config hash matches is read back
  instead of recomputed (``left_anti``-style stage skip); a config change
  invalidates downstream stages exactly like the reference's dims-mismatch
  retrain fallback.
- every write appends per-partition lineage rows
  ``(stage, partition_file, rows_out, ms, config_hash, run_id)`` to
  ``{root}/lineage`` (north_rule: per-partition lineage + metrics on every
  stage). Parquet stands in for Iceberg here; the write discipline (atomic
  replace, snapshot-per-stage) keeps Iceberg semantics so swapping in
  ``writeTo(...).createOrReplace()`` is a one-line change per write.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, config_hash: str, resume: bool = True):
        self.spark = spark
        self.root = root
        self.config_hash = config_hash
        self.resume = resume
        self.run_id = uuid.uuid4().hex[:12]
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._manifest.json")

    # -- manifest ----------------------------------------------------------
    def manifest(self, stage: str) -> "dict | None":
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("config_hash") == self.config_hash and m.get("status") == "complete")

    # -- io ----------------------------------------------------------------
    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(stage))

    def write(self, stage: str, df: DataFrame, rows_in: "int | None" = None) -> DataFrame:
        t0 = time.time()
        tmp = self._dir(stage) + ".tmp-" + self.run_id
        final = self._dir(stage)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        out = self.spark.read.parquet(final)
        ms = int((time.time() - t0) * 1000)
        n_rows = self._record_lineage(stage, out, ms, rows_in)
        with open(self._manifest_path(stage), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "status": "complete",
                    "config_hash": self.config_hash,
                    "rows": n_rows,
                    "schema": out.schema.jsonValue(),
                    "run_id": self.run_id,
                    "written_at": time.time(),
                    "ms": ms,
                },
                f,
                indent=2,
            )
        return out

    def _record_lineage(self, stage: str, out: DataFrame, ms: int, rows_in: "int | None"):
        # per-partition row counts come from the parquet footers (metadata
        # only — no second scan of the stage output). With an Iceberg catalog
        # this is the snapshot's per-file metrics; same content either way.
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self._dir(stage), "part-*")))
        rows = [
            (stage, os.path.basename(f), pq.ParquetFile(f).metadata.num_rows, ms,
             rows_in, self.config_hash, self.run_id)
            for f in files
        ]
        lin = self.spark.createDataFrame(
            rows,
            "stage string, partition_file string, rows_out long, ms long, "
            "rows_in long, config_hash string, run_id string",
        ).withColumn("written_at", F.current_timestamp())
        lin.coalesce(1).write.mode("append").parquet(os.path.join(self.root, "lineage"))
        return sum(r[2] for r in rows)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "lineage"))

    # -- stage driver --------------------------------------------------------
    def stage(self, name: str, build, rows_in: "int | None" = None) -> "tuple[DataFrame, bool]":
        """Compute-or-load: returns (df, was_skipped)."""
        if self.resume and self.is_complete(name):
            return self.read(name), True
        return self.write(name, build(), rows_in=rows_in), False
