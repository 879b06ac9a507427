"""srpr_lsh_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the *semantics* of the SRPR-LSH reference
(signed-random-projection LSH retrieval, `/root/reference`), re-expressed as an
idiomatic Spark pipeline for web-scale dedup:

- MinHash over transcript k-shingles + banded LSH candidate generation
  (the Jaccard-space analogue of the reference's L-tables/b-bits SRP scheme,
  ``src/lsh.h:27-44``),
- SimHash (SRP) over audio-feature fingerprint vectors — the reference's exact
  hashing scheme (``src/lsh.h:65-107``), bit-packed instead of ASCII strings,
- suffix-array exact-substring pass,
- exact Jaccard + decoded-PCM SNR verification (the reference's
  "LSH proposes, exact disposes" re-rank role, ``src/lsh.h:132-145``),
- connected components → cluster ids,
- checkpoint/resume with per-partition lineage (generalizing the reference's
  parameter-keyed preprocessing cache, ``src/DataManager.h:47-67``).

All heavy math runs in vectorized pandas/Arrow UDFs (no per-row Python); all
data movement is DataFrame algebra so Catalyst/AQE optimize the plan.
"""

from srpr_lsh_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
