"""Structured Streaming surface: incremental clip ingest + windowed rollups."""

from srpr_lsh_spark.streaming.ingest import (  # noqa: F401
    stream_signatures,
    windowed_event_rollup,
)
