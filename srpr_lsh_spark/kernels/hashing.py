"""Hashing kernels: shingles, MinHash, band hashes, SRP/SimHash, bottom-k.

Semantics reproduced from the reference (NOT ported):
- SRP sign-bit hashing: sign of projection onto seeded Gaussian hyperplanes,
  ``>= 0`` → bit 1 (``src/plane.h:16-22``, ``src/lsh.h:65-73``). The reference
  builds b-char '0'/'1' strings per table; we pack the b bits into one int64
  bucket key (SURVEY.md §4.3.1).
- L independent tables, candidate iff all b bits of some table match
  (``src/lsh.h:34-44``) — i.e. banded LSH with bands=L, rows=b.
- Seeded generation (mt19937(42) at ``src/lsh.h:80``) → here
  ``np.random.default_rng(seed)``; identical config ⇒ identical keys on any
  partitioning, which is what makes cluster output parallelism-invariant.

All functions are batch-vectorized: one call handles a whole Arrow record
batch with numpy ops only (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_GOLDEN = U64(0x9E3779B97F4A7C15)
_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)


def _mix_inplace(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer applied IN PLACE (caller owns the buffer)."""
    with np.errstate(over="ignore"):
        x ^= x >> U64(30)
        x *= _MIX1
        x ^= x >> U64(27)
        x *= _MIX2
        x ^= x >> U64(31)
    return x


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a public-domain bijective mixer (Steele et al.).

    Used everywhere a universal-ish 64-bit hash family is needed; the family
    member is selected by XORing a seed before mixing.
    """
    return _mix_inplace(x.astype(U64, copy=True))


def _seed_stream(seed: int, n: int, tag: int) -> np.ndarray:
    """n deterministic 64-bit seeds derived from (seed, tag)."""
    base = U64(seed & 0xFFFFFFFFFFFFFFFF) ^ mix64(np.array([tag], dtype=U64))[0]
    with np.errstate(over="ignore"):
        return mix64(base + _GOLDEN * np.arange(1, n + 1, dtype=U64))


def shingle_hashes(texts: "list[str] | np.ndarray", k: int, seed: int = 42):
    """Per text: sorted unique 64-bit hashes of its character k-shingles.

    Returns (flat_hashes:uint64[], offsets:int64[n+1]) in CSR layout so the
    caller can segment-reduce without Python loops. Texts shorter than k (after
    the caller's normalization) yield empty segments — those rows are routed to
    the exact-content path, never to MinHash banding (SURVEY.md §4.3.2).

    Heavy math is flat: all texts concatenate into ONE byte buffer and the
    k-step polynomial roll runs IN PLACE over every window of the whole batch
    at once (``h *= mult; h += window`` — no per-op temporaries: on this host
    fresh multi-MB numpy temps hit a first-touch page-fault wall, see
    BENCH/VARIANCE.md). Only the per-row sorted-unique remains a loop, and it
    is just ``np.unique`` over each small segment — measured 3.5× faster than
    the fully-per-row version and ~6× faster than a global (row, hash)
    lexsort dedup at typical transcript shapes.
    """
    mult = _seed_stream(seed, 1, tag=101)[0] | U64(1)  # odd multiplier
    n_rows = len(texts)
    encoded = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n_rows)
    starts = np.concatenate([[0], np.cumsum(lens)])
    big = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    n_win_total = big.size - k + 1
    if n_win_total <= 0:
        return np.empty(0, dtype=U64), offsets
    # rolling hash of EVERY window position in the big buffer (k in-place
    # vector ops); windows that straddle a row boundary are junk and are
    # simply never read by the per-row slicing below
    h = np.zeros(n_win_total, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h *= mult
            np.add(h, big[j : j + n_win_total], out=h, casting="unsafe")
    _mix_inplace(h)
    cnt = np.maximum(lens - k + 1, 0)
    per_row: list[np.ndarray] = []
    for i in range(n_rows):
        u = np.unique(h[starts[i] : starts[i] + cnt[i]])
        per_row.append(u)
        offsets[i + 1] = offsets[i] + u.size
    flat = np.concatenate(per_row) if per_row else np.empty(0, dtype=U64)
    return flat, offsets


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, n_perm: int, seed: int = 42,
    chunk_elems: int = 1 << 15,
) -> np.ndarray:
    """MinHash signatures for CSR shingle sets → (n_rows, n_perm) uint64.

    Permutation j is the hash family member ``mix64(x ^ seed_j)`` (Broder
    1997-style min over a random permutation of the shingle universe).
    Vectorized with ``np.minimum.reduceat`` over row segments.

    CACHE-BLOCKED: the permutation loop runs inside an L2-sized chunk of
    shingles (``chunk_elems`` × 8 B ≈ 256 KB), so each shingle is read from
    DRAM once per batch instead of ``n_perm`` × ~7 passes. This is the
    difference between a bandwidth-bound and a CPU-bound signatures stage:
    measured on this host, 16 concurrent workers run the naive layout at
    2.0× the 4-worker rate (bandwidth wall, 0.50 scaling efficiency) but the
    blocked layout at 3.34× (0.83 efficiency) AND 2.7× faster absolute.
    A 1000-executor cluster cares for the same reason: per-core bandwidth is
    the scarcest resource on a dense scan stage.

    Empty rows get the sentinel signature of all ``2**64-1`` (never banded).
    """
    n_rows = offsets.size - 1
    seeds = _seed_stream(seed, n_perm, tag=202)  # (n_perm,)
    out = np.full((n_rows, n_perm), np.iinfo(U64).max, dtype=U64)
    if flat.size == 0:
        return out
    starts = offsets[:-1]
    ends = offsets[1:]
    nonempty = np.flatnonzero(ends > starts)
    buf = np.empty(min(chunk_elems, flat.size), dtype=U64)
    lo = 0
    while lo < nonempty.size:
        # grow the row-chunk until ~chunk_elems shingles are covered
        hi = lo
        base = starts[nonempty[lo]]
        while hi < nonempty.size and ends[nonempty[hi]] - base <= buf.size:
            hi += 1
        if hi == lo:
            hi = lo + 1  # single row larger than the chunk: take it alone
        rows = nonempty[lo:hi]
        seg = flat[base : ends[rows[-1]]]
        local_starts = starts[rows] - base
        b = buf[: seg.size] if seg.size <= buf.size else np.empty(seg.size, dtype=U64)
        for j in range(n_perm):
            np.bitwise_xor(seg, seeds[j], out=b)
            _mix_inplace(b)
            out[rows, j] = np.minimum.reduceat(b, local_starts)
        lo = hi
    return out


def band_hashes(signatures: np.ndarray, bands: int, rows: int, seed: int = 42) -> np.ndarray:
    """Hash each band of r signature rows into one int64 key → (n, bands).

    Sentinel (empty-set) signatures map to a reserved key of -1; callers drop
    those rows before banding so empty transcripts never create a hot band.
    """
    n = signatures.shape[0]
    sig = signatures.reshape(n, bands, rows)
    h = np.full((n, bands), U64(seed), dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(rows):
            h = mix64(h ^ sig[:, :, j] + _GOLDEN)
    out = h.view(np.int64).copy()
    empty = (signatures == np.iinfo(U64).max).all(axis=1)
    out[empty] = -1
    return out


def bottom_k_sketch(flat: np.ndarray, offsets: np.ndarray, k: int) -> "tuple[np.ndarray, np.ndarray]":
    """Bottom-k sketch per CSR row: the k smallest shingle hashes (already
    sorted unique by shingle_hashes). Returns CSR (flat:int64, offsets).

    Used for substring-containment candidates: every shingle of a contained
    transcript is a shingle of its container, so the contained row's bottom-k
    hashes all occur in the container's shingle set — matches on ≥ t sketch
    hashes make the pair a containment candidate.
    """
    n_rows = offsets.size - 1
    new_off = np.zeros(n_rows + 1, dtype=np.int64)
    if n_rows == 0 or flat.size == 0:
        return np.empty(0, dtype=np.int64), new_off
    # flat head-take: row i contributes its first min(len_i, k) hashes
    # (shingle_hashes already sorted each segment ascending)
    lens = np.diff(offsets)
    cnt = np.minimum(lens, k)
    total = int(cnt.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    idx = np.repeat(offsets[:-1], cnt) + within
    np.cumsum(cnt, out=new_off[1:])
    return flat[idx].view(np.int64), new_off


def srp_planes(dim: int, tables: int, bits: int, seed: int = 42) -> np.ndarray:
    """Seeded Gaussian hyperplane tensor (tables*bits, dim), float32.

    Reference: per-table plane generation with mt19937(seed) gaussians,
    ``src/lsh.h:79-107`` (normalized there; normalization does not change the
    sign of a projection, so we skip it).
    """
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables * bits, dim)).astype(np.float32)


def srp_keys(vectors: np.ndarray, planes: np.ndarray, tables: int, bits: int) -> np.ndarray:
    """SRP/SimHash bucket keys → (n, tables) int64.

    Bit t of table i is ``1`` iff the projection onto plane (i*bits+t) is
    ``>= 0`` — the reference's convention (``src/plane.h:16-22``: ties hash to
    '1'). Bits are packed MSB-first into an int64 per table.
    """
    signs = (vectors @ planes.T) >= 0.0  # (n, tables*bits)
    n = signs.shape[0]
    signs = signs.reshape(n, tables, bits)
    powers = (1 << np.arange(bits - 1, -1, -1, dtype=np.int64))
    return signs.astype(np.int64) @ powers
