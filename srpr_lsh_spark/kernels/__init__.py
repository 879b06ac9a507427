"""Pure-numpy kernels (no Spark imports).

These are the vectorized cores that pandas/Arrow UDFs call. Keeping them
Spark-free makes them unit-testable (tests/test_kernels.py) against the
statistical properties the reference relies on: MinHash collision ≈ Jaccard
(Broder 1997) and SRP bit-agreement ≈ 1 − θ/π (Charikar 2002 — the same
identity the reference encodes at ``src/SRPRModel.h:149-156``).
"""

from srpr_lsh_spark.kernels.hashing import (
    band_hashes,
    bottom_k_sketch,
    minhash_signatures,
    mix64,
    shingle_hashes,
    srp_keys,
    srp_planes,
)
from srpr_lsh_spark.kernels.audio import (
    decode_pcm16_wav,
    encode_pcm16_wav,
    fingerprint,
    pair_snr_db,
)
from srpr_lsh_spark.kernels.text import (
    jaccard,
    normalize_transcript,
    suffix_array,
    sa_contains,
)

__all__ = [
    "band_hashes",
    "bottom_k_sketch",
    "decode_pcm16_wav",
    "encode_pcm16_wav",
    "fingerprint",
    "jaccard",
    "minhash_signatures",
    "mix64",
    "normalize_transcript",
    "pair_snr_db",
    "sa_contains",
    "shingle_hashes",
    "srp_keys",
    "srp_planes",
    "suffix_array",
]
