"""Stage 2b: exact-substring duplicate pass (suffix-array verified).

Containment is invisible to plain MinHash banding when the length ratio is
small (Jaccard of a 40% substring is ≈ 0.4 — below band sensitivity), so this
pass has its own candidate generator:

- candidates: the contained side's **bottom-k shingle sketch** is joined
  against an inverted index of ALL shingle hashes (every shingle of a
  contained transcript occurs in its container, so all sketch hashes must
  hit). The index is O(total transcript chars) rows — linear in corpus size,
  the same asymptotics as corpus-wide suffix-array construction. Shingles
  occurring in more than ``hot_shingle_cap`` clips are dropped from both sides
  (prefix-filtering-style stopword cut) to bound join fan-out.
- verification: per container group, ONE suffix array of the container's
  normalized transcript is built and each candidate substring is binary-
  searched (``kernels.text.suffix_array`` / ``sa_contains``) — exact, no
  false positives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from srpr_lsh_spark.config import DedupConfig
from srpr_lsh_spark.kernels.hashing import shingle_hashes
from srpr_lsh_spark.kernels.text import normalize_transcript, sa_contains, suffix_array


def _shingle_index(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """clips → (clip_id, h) inverted index of every distinct shingle hash."""
    k, seed, min_sh = cfg.k_shingle, cfg.seed, cfg.min_substr_shingles

    schema = StructType(
        [StructField("clip_id", StringType(), False), StructField("h", LongType(), False)]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            texts = normalize_transcript(pdf["transcript"].tolist())
            flat, off = shingle_hashes(texts, k=k, seed=seed)
            counts = off[1:] - off[:-1]
            ids = np.repeat(pdf["clip_id"].to_numpy(), counts)
            yield pd.DataFrame({"clip_id": ids, "h": flat.view(np.int64)})

    return clips.select("clip_id", "transcript").mapInPandas(gen, schema=schema)


def containment_candidates(
    clips: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """→ (short, long) candidate containment pairs."""
    eligible = signatures.filter(F.col("n_shingles") >= cfg.min_substr_shingles)
    sketch = eligible.select(
        F.col("clip_id").alias("short"),
        F.col("tr_len").alias("short_len"),
        F.explode("sketch").alias("h"),
    )
    index = _shingle_index(clips, cfg)
    # drop globally hot shingles from both sides
    hot = (
        index.groupBy("h").agg(F.count("*").alias("df_"))
        .filter(F.col("df_") > cfg.hot_shingle_cap)
        .select("h")
    )
    index = index.join(hot, "h", "left_anti")
    sketch = sketch.join(hot, "h", "left_anti")
    # how many non-hot sketch hashes each short side still has
    sk_size = sketch.groupBy("short", "short_len").agg(F.count("*").alias("sk_n"))
    lens = signatures.select(F.col("clip_id").alias("long"), F.col("tr_len").alias("long_len"))

    hits = (
        sketch.join(index.withColumnRenamed("clip_id", "long"), "h")
        .filter(F.col("short") != F.col("long"))
        .groupBy("short", "long")
        .agg(F.count("*").alias("matches"))
    )
    return (
        hits.join(sk_size, "short")
        .join(lens, "long")
        .filter(F.col("short_len") < F.col("long_len"))
        # a sketch gutted by the hot-shingle filter carries no evidence: with
        # fewer than ``containment_min_matches`` informative hashes, chance
        # co-occurrence of one rare shingle would flood the verifier (measured
        # ~340k false candidates at 100k docs without this floor)
        .filter(F.col("sk_n") >= F.lit(cfg.containment_min_matches))
        .filter(
            F.col("matches")
            >= F.greatest(
                F.lit(cfg.containment_min_matches), F.ceil(F.col("sk_n") * 0.8)
            )
        )
        .select("short", "long")
    )


def verify_containment(cands: DataFrame, clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Suffix-array verification → (a, b, source='substr') true containments.

    Runs as ``mapInPandas`` over a ROUND-ROBIN-repartitioned candidate frame,
    grouping by container WITHIN each Arrow batch — not ``groupBy(long)
    .applyInPandas``: the group-shuffle's AQE coalescing targets shuffle
    BYTES, and a few MB of candidate rows collapse to 2-3 partitions that
    then serialize ~14 s of suffix-array CPU onto as many cores (measured at
    200k clips, flat from 4 to 16 cores — the NOTES.md gotcha #7 shape).
    Splitting a container's group across batches only costs rebuilding its
    (small) suffix array per fragment; correctness is per-candidate."""
    t = clips.select("clip_id", "transcript")
    withs = cands.join(
        t.select(F.col("clip_id").alias("short"), F.col("transcript").alias("ts")), "short"
    ).join(
        t.select(F.col("clip_id").alias("long"), F.col("transcript").alias("tl")), "long"
    )
    withs = withs.repartition(withs.sparkSession.sparkContext.defaultParallelism)

    schema = StructType(
        [
            StructField("a", StringType(), False),
            StructField("b", StringType(), False),
            StructField("source", StringType(), False),
        ]
    )

    def check_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_a, out_b = [], []
            for _long, grp in pdf.groupby("long", sort=False):
                # one suffix array per container fragment; candidates
                # normalized in one batch, then each probed with an
                # O(|ts| log |tl|) binary search (the search itself is
                # inherently per-candidate — it IS the work, not overhead)
                tl = normalize_transcript([grp["tl"].iloc[0]])[0].encode("utf-8")
                sa = suffix_array(tl)
                tss = normalize_transcript(grp["ts"].tolist())
                for short, long_, ts in zip(grp["short"], grp["long"], tss):
                    tsb = ts.encode("utf-8")
                    if len(tsb) and sa_contains(tl, sa, tsb):
                        lo, hi = sorted([short, long_])
                        out_a.append(lo)
                        out_b.append(hi)
            yield pd.DataFrame({"a": out_a, "b": out_b, "source": "substr"})

    return withs.mapInPandas(check_batch, schema=schema)
