"""Stage 2: banding + candidate-pair generation with explicit skew handling.

The exploded ``bands(clip_id, band_id, band_hash)`` frame IS the LSH hash
table (the reference's ``vector<unordered_map<string, unordered_set<int>>>``,
``src/lsh.h:55``, re-expressed relationally — SURVEY.md §1.1.5). Candidates
are rows sharing ``(band_id, band_hash)``; dedup across bands is a
``dropDuplicates`` (the reference's candidate-set union, ``src/lsh.h:36-43``).

Skew design (SURVEY.md §4.3.2) — a naive self-join is O(|bucket|²), fatal for
hot bands (near-identical mass content, zero fingerprints):
- bucket sizes come from a map-side-combinable ``groupBy().count()`` first;
- buckets ≤ ``bucket_pair_cap`` expand all pairs from a per-bucket sorted
  member array (one ``collect_list`` shuffle, bounded by the cap, with the
  pair combinations generated in codegen — r6: replaces the former two-sided
  bucket self-join, one exchange + two sorts fewer per pass, guide §2.4);
- larger buckets emit STAR pairs to TWO anchors (every member ↔ the bucket's
  min clip_id AND ↔ its max clip_id): O(n) edges. Recall preservation here is
  a high-probability heuristic, not a guarantee — a member whose similarity
  to BOTH anchors falls below the verify threshold (while passing against
  other members) is stranded. Two forces make that rare in practice: the
  full-signature collapse (``space_candidates``) guarantees capped buckets
  contain only DISTINCT signatures, and a true near-dup family inside one
  bucket tends to be mutually similar, so two independent anchors give two
  chances to attach. The residual gap is measured, not assumed:
  tests/test_components.py plants an adversarial over-cap bucket whose min
  anchor is dissimilar to half the members.
- AQE skew-join splitting handles residual imbalance in the join itself.

Id encoding (r6, guide §2.3 "narrower types" / r5 VERDICT next-round #2):
the banding/pair subgraph shuffles tens of rows per clip, so
``combined_candidates`` / ``space_candidates`` first dictionary-encode
``clip_id`` strings to dense int64 via ``build_id_map`` (the SURVEY §2.3
id-remap operator; reference analogue ``src/DataManager.h:79-105``), run the
whole explode → sizes → pair → dedup pipeline on int64, and map back to
strings only for the final (much smaller) deduped pair frame. The encoding is
ORDER-PRESERVING (dense rank of the sorted ids), so min/max anchor choice,
collapse representatives and the a < b pair canonicalization are exactly the
string-order decisions — the decoded output is row-identical to the pre-r6
string plan (pytest-pinned). Min/max/groupBy on int64 also run as
HashAggregate instead of the SortAggregate that string min/max forces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from srpr_lsh_spark.config import SRP_BAND_OFFSET, DedupConfig

# band_id layout: [0, bands) = MinHash bands; SRP table t at SRP_BAND_OFFSET+t
SOURCE_MINHASH = "minhash"
SOURCE_SIMHASH = "simhash"


def build_id_map(signatures: DataFrame, n_parts: "int | None" = None) -> DataFrame:
    """``(clip_id string, cid long)`` dense ORDER-PRESERVING dictionary.

    cid = rank of clip_id in the sorted id set — fully deterministic given the
    id set, so every decision made on cid order (min-anchor, a < b) decodes to
    the identical string-order decision. Built scalably: range-partition the
    ids, per-partition ``row_number`` plus the partition's cumulative offset
    (computed with a window over the tiny per-partition-count frame — no
    driver collect, no single-partition sort of the data).

    Both checkpoints are EAGER (r6): ``parts`` is referenced by the counts
    aggregate and the offsets join, and the returned map by the encode join
    plus two decode joins — several of those subtrees are built by parallel
    broadcast/stage threads, and a lazy checkpoint lets them race to compute
    the same partitions (A/B at 200k: the candidates stage dropped 578 → 307
    CPU-s cold with eager checkpoints through this subgraph). Eagerness is
    also what guarantees the sampled range boundaries (and so
    ``spark_partition_id``) are evaluated exactly once."""
    spark = signatures.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    parts = (
        signatures.select("clip_id")
        .repartitionByRange(n_parts, "clip_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parts.groupBy("pid").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "pid", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off")
    )
    w_rn = Window.partitionBy("pid").orderBy("clip_id")
    return (
        parts.join(F.broadcast(offs), "pid")
        .select(
            "clip_id",
            (F.row_number().over(w_rn) - 1 + F.col("off")).cast("long").alias("cid"),
        )
        .localCheckpoint(eager=True)
    )


def _encode(signatures: DataFrame, id_map: DataFrame) -> DataFrame:
    """signatures with ``clip_id`` replaced by its int64 ``cid`` (same column
    name, so the banding operators below are id-type-agnostic)."""
    return (
        signatures.join(id_map, "clip_id")
        .drop("clip_id")
        .withColumnRenamed("cid", "clip_id")
    )


def _decode_pairs(pairs: DataFrame, id_map: DataFrame) -> DataFrame:
    """(a cid, b cid, source) → (a, b, source) strings via two map joins."""
    am = id_map.select(F.col("cid").alias("a"), F.col("clip_id").alias("_a"))
    bm = id_map.select(F.col("cid").alias("b"), F.col("clip_id").alias("_b"))
    return (
        pairs.join(am, "a")
        .join(bm, "b")
        .select(F.col("_a").alias("a"), F.col("_b").alias("b"), "source")
    )


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
        (F.col("t") + F.lit(SRP_BAND_OFFSET)).alias("band_id"),
        "band_hash",
        F.lit(SOURCE_SIMHASH).alias("source"),
    )
    return mh.unionByName(sh)


def _source_of_band() -> "F.Column":
    """``source`` is fully determined by the band id (MinHash bands occupy
    [0, SRP_BAND_OFFSET); SRP tables sit above it — the band-id layout
    invariant ``DedupConfig.__post_init__`` asserts), so band rows don't
    need to CARRY the string: deriving it at pair-emit time drops ~40% of
    every band row's bytes through the sizes/collect_list shuffles and
    halves the per-member struct in the bucket arrays (r6, guide §2.3
    "shuffle fewer bytes"). All rows of one bucket share ``band_id``, so
    this is exactly the former "pair keeps a's source" value."""
    return F.when(
        F.col("band_id") < F.lit(SRP_BAND_OFFSET), F.lit(SOURCE_MINHASH)
    ).otherwise(F.lit(SOURCE_SIMHASH))


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """bands(clip_id, band_id, band_hash) → candidate_pairs(a, b, source)
    with a < b, distinct; ``source`` derived from the band-id layout
    (``_source_of_band``) — an attached source column, if present, is
    ignored. Two-regime plan keyed by bucket size (see module docstring).
    Id-type agnostic: works identically on string clip_ids (tests,
    explode_bands callers) and the int64-encoded pipeline path.
    """
    key = ["band_id", "band_hash"]
    bands = bands.select("clip_id", *key)
    sizes = bands.groupBy(*key).agg(F.count("*").alias("bsz")).filter(F.col("bsz") >= 2)
    tagged = bands.join(sizes, key)  # buckets of size 1 drop out here

    small = tagged.filter(F.col("bsz") <= cfg.bucket_pair_cap)
    big = tagged.filter(F.col("bsz") > cfg.bucket_pair_cap)

    # capped buckets: ONE groupBy into a sorted member array (bounded by the
    # cap), then emit every a < b combination in codegen — the former
    # two-sided self-join shuffled both projections and sorted each for an
    # SMJ; this shuffles the member rows once (guide §2.4).
    grouped = small.groupBy(*key).agg(
        F.sort_array(F.collect_list("clip_id")).alias("ms")
    )
    combos = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    small_pairs = (
        grouped.select(_source_of_band().alias("source"), F.explode(combos).alias("p"))
        .select("p.a", "p.b", "source")
        .filter(F.col("a") < F.col("b"))
    )

    # two-anchor star: min AND max clip_id — still O(n) edges per bucket, but
    # a member dissimilar to one anchor gets a second independent chance to
    # attach before exact verification (see module docstring)
    reps = big.groupBy(*key).agg(
        F.min("clip_id").alias("lo"), F.max("clip_id").alias("hi")
    )
    joined = big.join(reps, key).withColumn("source", _source_of_band())
    lo_pairs = joined.filter(F.col("clip_id") != F.col("lo")).select(
        F.col("lo").alias("a"), F.col("clip_id").alias("b"), "source"
    )
    hi_pairs = joined.filter(F.col("clip_id") != F.col("hi")).select(
        F.col("clip_id").alias("a"), F.col("hi").alias("b"), "source"
    )
    star_pairs = lo_pairs.unionByName(hi_pairs)

    return small_pairs.unionByName(star_pairs).dropDuplicates(["a", "b", "source"])


def space_candidates(signatures: DataFrame, cfg: DedupConfig, source: str) -> DataFrame:
    """Candidate pairs for one LSH space with an exact-signature collapse.

    Rows whose FULL signature is identical (all minhash components / all SRP
    table keys) are collapsed to their min-clip_id representative BEFORE
    banding: members link to the rep with O(n) star edges, and only reps
    enter the band explode + bucket join. Two effects at scale:

    - twin-heavy corpora (mass-duplicated content, silent audio) stop
      multiplying the same pair set across every band/table — a signature
      family of m rows costs m star edges instead of O(L·m²) bucket pairs;
    - capped hot buckets contain only DISTINCT signatures, so the over-cap
      star regime can no longer strand a duplicate family whose members were
      capped away from each other (they share a full signature and are
      already star-linked).

    All emitted edges (star and bucket) still pass exact verification, so
    this changes cost, never correctness of the final clusters.

    Runs on int64-encoded ids internally (module docstring); the returned
    frame carries the original string ids.
    """
    id_map = build_id_map(signatures)
    enc = _encode(signatures, id_map)
    within, bands = _space_parts(enc, cfg, source)
    return _decode_pairs(candidate_pairs(bands, cfg).unionByName(within), id_map)


def _space_parts(signatures: DataFrame, cfg: DedupConfig, source: str):
    """(within-collapse star edges, banded rep rows) for one LSH space —
    the two halves ``space_candidates`` composes. Factored out so
    ``combined_candidates`` can run ONE bucket-join pass over both spaces."""
    if source == SOURCE_MINHASH:
        eligible = signatures.filter(F.col("n_shingles") > 0)
        sig_hash = F.xxhash64("minhash")
        explode_cols = lambda df: df.select(
            "clip_id", F.posexplode("band_keys").alias("band_id", "band_hash")
        ).filter(F.col("band_hash") != F.lit(-1))
    elif source == SOURCE_SIMHASH:
        eligible = signatures
        sig_hash = F.xxhash64("sim_keys")
        explode_cols = lambda df: df.select(
            "clip_id", F.posexplode("sim_keys").alias("t", "band_hash")
        ).select(
            "clip_id",
            (F.col("t") + F.lit(SRP_BAND_OFFSET)).alias("band_id"),
            "band_hash",
        )
    else:
        raise ValueError(source)

    keyed = eligible.select("clip_id", sig_hash.alias("sh"))
    reps = keyed.groupBy("sh").agg(F.min("clip_id").alias("rep"))
    within = (
        keyed.join(reps, "sh")
        .filter(F.col("clip_id") != F.col("rep"))
        .select(F.col("rep").alias("a"), F.col("clip_id").alias("b"),
                F.lit(source).alias("source"))
    )
    rep_rows = eligible.join(
        reps.select(F.col("rep").alias("clip_id")), "clip_id", "left_semi"
    )
    # band rows carry NO source string: candidate_pairs derives it from the
    # band-id layout (_source_of_band), so the sizes/collect_list shuffles
    # move (id, band_id, hash) only
    bands = explode_cols(rep_rows)
    return within, bands


def combined_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Both LSH spaces through ONE bucket-join pass (r5 stage-count cut).

    Row-identical to ``space_candidates(MINHASH) ∪ space_candidates(SIMHASH)``
    (pytest-pinned): the band-id key spaces are disjoint ([0, bands) vs
    SRP_BAND_OFFSET+table), so buckets never mix across spaces and per-space
    bucket sizes are unchanged; ``source`` rides along and ``dropDuplicates``
    includes it, so no cross-space dedup happens either. The win is plan
    shape, not rows — one sizes groupBy, one tagged join, one pair
    deduplication instead of two of each, roughly halving the candidates
    stage's shuffle-stage count, which is the corpus-size-independent
    scheduling floor the scaling studies keep measuring (VERDICT r4 #1).

    r6: the whole pass runs on int64-encoded ids (module docstring); only the
    final deduped pair frame is mapped back to strings."""
    id_map = build_id_map(signatures)
    enc = _encode(signatures, id_map)
    mh_within, mh_bands = _space_parts(enc, cfg, SOURCE_MINHASH)
    sh_within, sh_bands = _space_parts(enc, cfg, SOURCE_SIMHASH)
    pairs = candidate_pairs(mh_bands.unionByName(sh_bands), cfg)
    out = pairs.unionByName(mh_within).unionByName(sh_within)
    return _decode_pairs(out, id_map)


def exact_content_edges(signatures: DataFrame) -> DataFrame:
    """Exact-dup short-circuit: identical ``content_key`` ⇒ duplicate, no
    pairwise verification. Emits star edges (group min ↔ member): O(n) per
    group even for the giant byte-identical skew group.

    Generalizes the reference's parameter-keyed cache identity discipline and
    the trivial identical-signature case. The key is a 128-bit blake2b digest:
    expected collisions ≈ n²/2¹²⁹ ≈ 10⁻¹⁵ even at 10¹² clips, so exact edges
    are accepted without further verification — the digest is sized to make a
    false merge impossible in practice, not mitigated downstream.
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
