"""Explicit-schema readers (never inferSchema — determinism, SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def clips_schema() -> StructType:
    """Authoritative input shape — BASELINE.json input_hint."""
    return StructType(
        [
            StructField("clip_id", StringType(), False),
            StructField("bytes", BinaryType(), True),
            StructField("sr_hz", IntegerType(), True),
            StructField("dur_ms", IntegerType(), True),
            StructField("codec", StringType(), True),
            StructField("transcript", StringType(), True),
        ]
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table from ``sf_dir``."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
