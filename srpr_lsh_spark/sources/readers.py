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


def ratings_schema() -> StructType:
    """MovieLens-shaped ratings row (``src/Triplet.h:21-26``)."""
    from pyspark.sql.types import DoubleType, LongType

    return StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("movie_id", LongType(), False),
            StructField("rating", DoubleType(), False),
            StructField("ts", LongType(), True),
        ]
    )


def read_ratings_csv(
    spark: SparkSession, path: str, max_ratings: "int | None" = None
) -> DataFrame:
    """CSV ratings scan with explicit schema, header handling, and row-limit
    pushdown — the reference's ``load_movielens_ratings``
    (``src/Triplet.h:84-122``: positional parse, header skip, stop at
    ``max_ratings``). ``limit`` plans as LocalLimit and stops the scan."""
    df = spark.read.schema(ratings_schema()).option("header", "true").csv(path)
    return df.limit(max_ratings) if max_ratings is not None else df


def triplets_schema() -> StructType:
    """Pairwise-preference row (``src/Triplet.h:14-18``)."""
    from pyspark.sql.types import LongType

    return StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("pos_item", LongType(), False),
            StructField("neg_item", LongType(), False),
        ]
    )


def read_triplets_csv(spark: SparkSession, path: str) -> DataFrame:
    """Triplet CSV scan — the reference's ``load_triplets``
    (``src/Triplet.h:29-81``: positional ``(user, preferred, less_preferred)``
    parse with header sniffing). The reference sniffs by checking line 1 for
    column-name substrings (``Triplet.h:38-42``); here the sniff is
    declarative: parse EVERY line against the numeric schema in permissive
    mode — a header line casts to all-nulls and is dropped, data lines parse —
    so files with or without a header both load correctly (unlike a blanket
    ``header=true``, which would eat a headerless file's first data row)."""
    df = spark.read.schema(triplets_schema()).csv(path)
    return df.dropna(how="any")
