"""Structured Streaming tests: incremental signature ingest (exactly-once
across restarts via the stream checkpoint) + watermarked windowed rollup
pinned against the batch aggregation oracle."""

import os

import pytest

from srpr_lsh_spark.config import DedupConfig
from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips
from srpr_lsh_spark.streaming.ingest import stream_signatures, windowed_event_rollup

CFG = DedupConfig(shuffle_partitions=8)


def test_incremental_signature_ingest(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # batch 1: 100 clips land
    p1 = SynthParams(n_clips=100, block_size=50, seed=42, min_dur_ms=300, max_dur_ms=800)
    clips1, _ = synthesize_clips(spark, p1, out_dir=str(tmp_path / "b1"))
    clips1.write.mode("append").parquet(in_dir)
    stream_signatures(spark, in_dir, out_dir, ckpt, CFG)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 100
    # signatures match the batch stage byte-for-byte on the shared kernel
    from srpr_lsh_spark.operators.signatures import compute_signatures

    want = {
        r["clip_id"]: r["content_key"]
        for r in compute_signatures(clips1, CFG).select("clip_id", "content_key").collect()
    }
    got_keys = {r["clip_id"]: r["content_key"] for r in got1.select("clip_id", "content_key").collect()}
    assert got_keys == want

    # batch 2: 60 more clips arrive; a restarted stream with the same
    # checkpoint processes ONLY the new files
    p2 = SynthParams(n_clips=60, block_size=30, seed=99, min_dur_ms=300, max_dur_ms=800)
    clips2, _ = synthesize_clips(spark, p2, out_dir=str(tmp_path / "b2"))
    from pyspark.sql import functions as F

    # both synth corpora number clips from 0 — disambiguate the new arrivals
    clips2 = clips2.withColumn("clip_id", F.concat(F.lit("b2_"), F.col("clip_id")))
    clips2.write.mode("append").parquet(in_dir)
    stream_signatures(spark, in_dir, out_dir, ckpt, CFG)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 160
    assert got2.select("clip_id").distinct().count() == 160  # no reprocessing dupes

    # idempotent rerun with nothing new: no growth
    stream_signatures(spark, in_dir, out_dir, ckpt, CFG)
    assert spark.read.parquet(out_dir).count() == 160


def test_windowed_rollup_matches_batch_oracle(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for h in range(3):
        for m in (0, 20, 40):
            rows.append((base + dt.timedelta(hours=h, minutes=m), "click", 10.0 + h))
    rows.append((base + dt.timedelta(hours=1, minutes=5), "view", 1.5))
    events = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")

    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in windowed_event_rollup(events).collect()
    }
    assert got[(base, "click")] == (3, 30.0)
    assert got[(base + dt.timedelta(hours=1), "click")] == (3, 33.0)
    assert got[(base + dt.timedelta(hours=1), "view")] == (1, 1.5)
    assert len(got) == 4
