"""Stage 2: banding + candidate-pair generation with explicit skew handling.

The exploded ``bands(clip_id, band_id, band_hash)`` frame IS the LSH hash
table (the reference's ``vector<unordered_map<string, unordered_set<int>>>``,
``src/lsh.h:55``, re-expressed relationally — SURVEY.md §1.1.5). Candidates
are rows sharing ``(band_id, band_hash)``; dedup across bands is a
``dropDuplicates`` (the reference's candidate-set union, ``src/lsh.h:36-43``).

Skew design (SURVEY.md §4.3.2) — a naive self-join is O(|bucket|²), fatal for
hot bands (near-identical mass content, zero fingerprints):
- bucket sizes come from a map-side-combinable ``groupBy().count()`` first;
- buckets ≤ ``bucket_pair_cap`` do the exact all-pairs self-join;
- larger buckets emit STAR pairs (every member ↔ the bucket's min clip_id):
  O(n) edges, and after exact verification + connected components the
  transitive closure recovers the full cluster, so cluster-level dup-pair
  recall is preserved while the worst bucket costs linear work.
- AQE skew-join splitting handles residual imbalance in the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from srpr_lsh_spark.config import DedupConfig

# band_id layout: [0, bands) = MinHash bands; [bands, bands+sim_tables) = SRP tables
SOURCE_MINHASH = "minhash"
SOURCE_SIMHASH = "simhash"


def explode_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures → bands(clip_id, band_id, band_hash, source).

    Empty-transcript rows (band key sentinel -1) are excluded from the MinHash
    space: no shingles ⇒ no Jaccard evidence ⇒ only the exact-content path may
    link them. Zero fingerprints are NOT excluded from the SRP space — they
    are the planted hot band the cap must absorb.
    """
    mh = (
        signatures.select(
            "clip_id", F.posexplode("band_keys").alias("band_id", "band_hash")
        )
        .filter(F.col("band_hash") != F.lit(-1))
        .withColumn("source", F.lit(SOURCE_MINHASH))
    )
    sh = signatures.select(
        "clip_id", F.posexplode("sim_keys").alias("t", "band_hash")
    ).select(
        "clip_id",
        (F.col("t") + F.lit(cfg.bands)).alias("band_id"),
        "band_hash",
        F.lit(SOURCE_SIMHASH).alias("source"),
    )
    return mh.unionByName(sh)


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """bands → candidate_pairs(a, b, source) with a < b, distinct.

    Two-regime plan keyed by bucket size (see module docstring).
    """
    key = ["band_id", "band_hash"]
    sizes = bands.groupBy(*key).agg(F.count("*").alias("bsz")).filter(F.col("bsz") >= 2)
    tagged = bands.join(sizes, key)  # buckets of size 1 drop out here

    small = tagged.filter(F.col("bsz") <= cfg.bucket_pair_cap)
    big = tagged.filter(F.col("bsz") > cfg.bucket_pair_cap)

    a = small.select(*key, F.col("clip_id").alias("a"), F.col("source").alias("source"))
    b = small.select(*key, F.col("clip_id").alias("b"))
    small_pairs = a.join(b, key).filter(F.col("a") < F.col("b")).select("a", "b", "source")

    reps = big.groupBy(*key).agg(F.min("clip_id").alias("a"))
    star_pairs = (
        big.join(reps, key)
        .filter(F.col("clip_id") != F.col("a"))
        .select("a", F.col("clip_id").alias("b"), "source")
    )

    return small_pairs.unionByName(star_pairs).dropDuplicates(["a", "b", "source"])


def exact_content_edges(signatures: DataFrame) -> DataFrame:
    """Exact-dup short-circuit: identical ``content_key`` ⇒ duplicate, no
    pairwise verification. Emits star edges (group min ↔ member): O(n) per
    group even for the giant byte-identical skew group.

    Generalizes the reference's parameter-keyed cache identity discipline and
    the trivial identical-signature case; collision risk of the 64-bit digest
    is ~n²/2⁶⁵ — negligible below ~10⁹ distinct contents, and any collision is
    still filtered by downstream cluster verification in strict mode.
    """
    w_min = F.min("clip_id")
    reps = signatures.groupBy("content_key").agg(
        w_min.alias("a"), F.count("*").alias("csz")
    ).filter(F.col("csz") >= 2)
    return (
        signatures.join(reps.select("content_key", "a"), "content_key")
        .filter(F.col("clip_id") != F.col("a"))
        .select("a", F.col("clip_id").alias("b"), F.lit("exact").alias("source"))
    )
