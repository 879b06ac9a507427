"""BPR triplet generation — semantic parity with the reference's
``ratings_to_triplets`` (``src/Triplet.h:125-200``), fully relational.

Reference semantics reproduced:
- group ratings by user; users with < 2 ratings are dropped
  (``src/Triplet.h:147-149``);
- for each unordered item pair of a user, keep it iff
  ``|r_i − r_j| ≥ min_rating_diff`` (``src/Triplet.h:159,191``);
- orient to (preferred, less_preferred) by rating comparison
  (``src/Triplet.h:160-165``);
- cap at ``max_triplets_per_user`` via seeded sampling
  (``src/Triplet.h:168-200``; mt19937(42) shuffle / rejection sampling).

Divergence (documented): the cap's random subset uses a seeded hash order
(``xxhash64(seed, user, pos, neg)``) instead of mt19937 — the *set semantics*
(deterministic, ≤ cap, uniform-ish, same on any partitioning) match; the
specific sampled subset does not bit-match the C++ RNG. The uncapped triplet
set is bit-identical to the reference's definition and is what the DuckDB
oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def generate_triplets(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    min_rating_diff: float = 0.5,
    max_per_user: "int | None" = 300,
    seed: int = 42,
) -> DataFrame:
    """ratings → (user, pos_item, neg_item) preference triplets."""
    r = ratings.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i"), F.col(rating_col).alias("r")
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b, (F.col("a.u") == F.col("b.u")) & (F.col("a.i") < F.col("b.i"))
    ).filter(F.abs(F.col("a.r") - F.col("b.r")) >= min_rating_diff)
    oriented = pairs.select(
        F.col("a.u").alias("user_id"),
        F.when(F.col("a.r") > F.col("b.r"), F.col("a.i")).otherwise(F.col("b.i")).alias("pos_item"),
        F.when(F.col("a.r") > F.col("b.r"), F.col("b.i")).otherwise(F.col("a.i")).alias("neg_item"),
    )
    if max_per_user is None:
        return oriented
    w = Window.partitionBy("user_id").orderBy(
        F.xxhash64(F.lit(seed), "user_id", "pos_item", "neg_item")
    )
    return (
        oriented.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_user)
        .drop("rn")
    )
