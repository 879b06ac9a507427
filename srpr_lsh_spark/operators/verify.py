"""Stage 3: exact verification — "LSH proposes, exact disposes".

Mirrors the role of the reference's exact-cosine re-rank over LSH candidates
(``src/lsh.h:132-145``): false positives from banding are eliminated exactly;
only missed candidates can cost recall.

- text pairs: exact k-shingle Jaccard on the two normalized transcripts,
  accepted at ``jaccard_threshold``;
- audio pairs: two-phase — cheap fingerprint cosine from the signatures table
  first (this is where the zero-fingerprint hot-band star pairs die without
  ever touching audio), then decoded-PCM pair SNR ≥ ``snr_db_threshold`` on
  the survivors (the BASELINE.json per-row invariant).

``bytes`` is fetched via a semi-join-shrunken projection of the clips table,
so audio bytes move only for rows that still matter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from srpr_lsh_spark.config import DedupConfig
from srpr_lsh_spark.kernels.audio import decode_pcm16_wav, pair_snr_db
from srpr_lsh_spark.kernels.hashing import shingle_hashes
from srpr_lsh_spark.kernels.text import jaccard, normalize_transcript


def _attach(pairs: DataFrame, lookup: DataFrame, cols: "dict[str, str]", on: str) -> DataFrame:
    """Join ``lookup`` columns onto ``pairs`` for side ``on`` ('a' or 'b'),
    after shrinking ``lookup`` to only the referenced ids (semi-join) so wide
    columns (transcripts, bytes) never shuffle for unreferenced rows."""
    ids = pairs.select(F.col(on).alias("clip_id")).distinct()
    slim = lookup.join(ids, "clip_id", "left_semi").select(
        F.col("clip_id").alias(on), *[F.col(src).alias(dst) for src, dst in cols.items()]
    )
    return pairs.join(slim, on)


def verify_text_pairs(pairs: DataFrame, clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(a, b, source) + clips → verified (a, b, source, jaccard) at threshold."""
    withz = _attach(pairs, clips, {"transcript": "ta"}, "a")
    withz = _attach(withz, clips, {"transcript": "tb"}, "b")
    k, seed, thr = cfg.k_shingle, cfg.seed, cfg.jaccard_threshold

    schema = StructType(
        [
            StructField("a", StringType(), False),
            StructField("b", StringType(), False),
            StructField("source", StringType(), False),
            StructField("jaccard", DoubleType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ta = normalize_transcript(pdf["ta"].tolist())
            tb = normalize_transcript(pdf["tb"].tolist())
            fa, oa = shingle_hashes(ta, k=k, seed=seed)
            fb, ob = shingle_hashes(tb, k=k, seed=seed)
            js = np.array(
                [
                    jaccard(fa[oa[i] : oa[i + 1]], fb[ob[i] : ob[i + 1]])
                    for i in range(len(pdf))
                ]
            )
            keep = js >= thr
            out = pdf.loc[keep, ["a", "b", "source"]].copy()
            out["jaccard"] = js[keep]
            yield out

    return withz.mapInPandas(gen, schema=schema)


def verify_audio_pairs(
    pairs: DataFrame, clips: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(a, b, source) → verified (a, b, source, cosine, snr_db)."""
    fp = signatures.select("clip_id", "fp")
    withf = _attach(pairs, fp, {"fp": "fa"}, "a")
    withf = _attach(withf, fp, {"fp": "fb"}, "b")
    # phase 1: fingerprint cosine (fingerprints are L2-normalized → dot product)
    cos = F.aggregate(
        F.zip_with("fa", "fb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )
    survivors = withf.withColumn("cosine", cos).filter(
        F.col("cosine") >= F.lit(cfg.cosine_threshold)
    ).select("a", "b", "source", "cosine")

    # phase 2: decoded-PCM SNR on the survivors only
    blobs = clips.select("clip_id", "bytes", "codec")
    withb = _attach(survivors, blobs, {"bytes": "ba", "codec": "ca"}, "a")
    withb = _attach(withb, blobs, {"bytes": "bb", "codec": "cb"}, "b")
    snr_thr = cfg.snr_db_threshold

    schema = StructType(
        [
            StructField("a", StringType(), False),
            StructField("b", StringType(), False),
            StructField("source", StringType(), False),
            StructField("cosine", DoubleType(), False),
            StructField("snr_db", DoubleType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            snrs = np.empty(len(pdf))
            for i, (ba, ca, bb, cb) in enumerate(
                zip(pdf["ba"], pdf["ca"], pdf["bb"], pdf["cb"])
            ):
                if ba is None or bb is None:
                    snrs[i] = float("-inf")
                    continue
                pa = decode_pcm16_wav(bytes(ba), codec=ca)
                pb = decode_pcm16_wav(bytes(bb), codec=cb)
                # symmetric: require both directions to clear the bar so the
                # pair relation stays order-independent
                snrs[i] = min(pair_snr_db(pa, pb), pair_snr_db(pb, pa))
            keep = snrs >= snr_thr
            out = pdf.loc[keep, ["a", "b", "source", "cosine"]].copy()
            out["snr_db"] = np.clip(snrs[keep], -1e9, 1e9)
            yield out

    return withb.mapInPandas(gen, schema=schema)
