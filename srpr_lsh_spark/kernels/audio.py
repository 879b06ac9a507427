"""Audio kernels: PCM16 + G.711 WAV encode/decode, spectral fingerprint, SNR.

The container ships no audio libraries, so the codec surface is pure numpy:
``pcm_s16le`` (header parse + ``np.frombuffer``) and the ITU-T G.711 companded
telephony codecs ``pcm_mulaw`` / ``pcm_alaw`` (256-entry decode LUTs built
from the spec's segment/mantissa layout — one fancy-index per batch, no
per-sample Python). Any other codec raises NotImplementedError at the decode
boundary — the Spark-side plumbing (schema, batching, UDF signatures) is
codec-agnostic and real.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def _mulaw_decode_lut() -> np.ndarray:
    """G.711 μ-law byte → linear int16 (the classic ulaw2linear table):
    complement, then ``t = ((mantissa << 3) + 0x84) << exponent`` with the
    0x84 bias removed; sign bit picks the negative branch. Range ±32124."""
    u = (~np.arange(256, dtype=np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_decode_lut() -> np.ndarray:
    """G.711 A-law byte → linear int16 (alaw2linear): XOR 0x55, segment 0
    adds half-step 8, segment 1 adds the 0x108 bias, higher segments shift.
    Sign bit SET means positive in A-law. Range ±32256."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_G711_LUTS = {"pcm_mulaw": _mulaw_decode_lut(), "pcm_alaw": _alaw_decode_lut()}


def g711_encode(samples: np.ndarray, law: str) -> np.ndarray:
    """float [-1, 1] → G.711 code bytes, nearest-decoded-value quantization
    (vectorized: one ``searchsorted`` against the sorted decode table)."""
    lut = _G711_LUTS[law].astype(np.float64) / 32768.0
    order = np.argsort(lut, kind="stable")
    sv = lut[order]
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pos = np.searchsorted(sv, x)
    lo = np.clip(pos - 1, 0, sv.size - 1)
    hi = np.clip(pos, 0, sv.size - 1)
    pick = np.where(np.abs(sv[hi] - x) < np.abs(x - sv[lo]), hi, lo)
    return order[pick].astype(np.uint8)


def encode_g711_wav(samples: np.ndarray, sr_hz: int, law: str) -> bytes:
    """Mono 8-bit G.711 WAV (format tag 7 = μ-law, 6 = A-law)."""
    data = g711_encode(samples, law).tobytes()
    tag = 7 if law == "pcm_mulaw" else 6
    hdr = (
        _RIFF
        + struct.pack("<I", 36 + len(data))
        + _WAVE
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, tag, 1, sr_hz, sr_hz, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def encode_pcm16_wav(samples: np.ndarray, sr_hz: int) -> bytes:
    """Mono PCM16 little-endian WAV with a minimal 44-byte header.

    ``samples`` is float in [-1, 1]; values are clipped and scaled to int16.
    """
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        _RIFF
        + struct.pack("<I", 36 + len(data))
        + _WAVE
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_pcm16_wav(blob: bytes, codec: str = "pcm_s16le") -> np.ndarray:
    """Decode a mono WAV payload → float64 samples in [-1, 1].

    ``pcm_s16le``: ``np.frombuffer`` of the data chunk. ``pcm_mulaw`` /
    ``pcm_alaw``: one LUT fancy-index over the 8-bit data chunk (G.711).
    Walks RIFF chunks to find ``data`` (robust to extra chunks); no
    per-sample Python on any path. Other codecs raise at this boundary —
    plug a real decoder here on a cluster with audio libs.
    """
    if codec not in ("pcm_s16le", "pcm_mulaw", "pcm_alaw"):
        raise NotImplementedError(
            f"codec {codec!r}: pcm_s16le/pcm_mulaw/pcm_alaw are decodable in "
            "this container; plug a real decoder here on a cluster with audio libs"
        )
    if len(blob) < 44 or blob[:4] != _RIFF or blob[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if cid == b"data":
            raw = blob[pos + 8 : pos + 8 + size]
            if codec == "pcm_s16le":
                return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
            codes = np.frombuffer(raw, dtype=np.uint8)
            return _G711_LUTS[codec][codes].astype(np.float64) / 32768.0
        pos += 8 + size + (size & 1)
    raise ValueError("no data chunk found")


def fingerprint(samples: np.ndarray, dim: int = 32) -> np.ndarray:
    """D-dim log-band-energy spectral fingerprint, L2-normalized float32.

    Plays the role of the reference's learned D=32 item vectors
    (``src/vec.h:13-42``, ``main.cpp:62``) as SRP input: near-identical audio
    (SNR ≥ 30 dB) ⇒ near-parallel fingerprints ⇒ same SRP buckets with high
    probability. All-silent audio yields the zero vector — zero vectors all
    share one SRP bucket per table (sign(0) → 1, the reference's tie rule),
    which is exactly the hot-band case the skew machinery must absorb; they are
    rejected later by the cosine/SNR verifier.
    """
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    spec = np.abs(np.fft.rfft(samples)) ** 2
    # log-spaced band edges over the spectrum (skip DC)
    edges = np.unique(
        np.round(np.logspace(0, np.log10(max(spec.size - 1, 2)), dim + 1)).astype(np.int64)
    )
    if edges.size < dim + 1:  # short clips: pad with linear edges
        edges = np.linspace(1, spec.size, dim + 1).astype(np.int64)
    energies = np.add.reduceat(spec, np.clip(edges[:-1], 0, spec.size - 1))[:dim]
    if energies.size < dim:
        energies = np.pad(energies, (0, dim - energies.size))
    # Linear band power (not log): additive noise at SNR s perturbs the
    # normalized vector by O(10^(-s/10)), so 30 dB near-dups keep cosine ≈ 1.
    v = energies
    norm = np.linalg.norm(v)
    if norm < 1e-12:
        return np.zeros(dim, dtype=np.float32)
    return (v / norm).astype(np.float32)


def batch_pair_snr_db(seq_a, seq_b) -> np.ndarray:
    """Symmetric pair SNR (dB) for a batch of variable-length signal pairs:
    ``min(snr(a_i→b_i), snr(b_i→a_i))`` per pair, all dot products in one
    vectorized pass.

    Implementation: common-prefix slices are concatenated into flat arrays and
    the per-pair signal/noise powers come from ``np.add.reduceat`` over the
    offsets — no (batch × max_len) zero-padded matrix is ever materialized
    (this host punishes first-touch of large fresh allocations; see NOTES.md).
    Because the noise term is direction-independent, the symmetric min is
    simply ``10·log10(min(P_a, P_b) / P_noise)``.
    """
    m = len(seq_a)
    out = np.full(m, -np.inf)
    if m == 0:
        return out
    arrs_a, arrs_b, idx = [], [], []
    for i in range(m):
        x = np.asarray(seq_a[i], dtype=np.float64)
        y = np.asarray(seq_b[i], dtype=np.float64)
        n = min(x.size, y.size)
        if n == 0:
            continue
        arrs_a.append(x[:n])
        arrs_b.append(y[:n])
        idx.append(i)
    if not idx:
        return out
    lens = np.fromiter((a.size for a in arrs_a), np.int64, len(arrs_a))
    offs = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    fa = np.concatenate(arrs_a)
    fb = np.concatenate(arrs_b)
    p_a = np.add.reduceat(fa * fa, offs)
    p_b = np.add.reduceat(fb * fb, offs)
    d = fa - fb
    p_n = np.add.reduceat(d * d, offs)
    p_sig = np.minimum(p_a, p_b)
    snr = np.full(len(idx), -np.inf)
    live = p_sig >= 1e-20
    exact = live & (p_n < 1e-20)
    ok = live & ~exact
    snr[exact] = np.inf
    snr[ok] = 10.0 * np.log10(p_sig[ok] / p_n[ok])
    out[np.asarray(idx)] = snr
    return out


def pair_snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR (dB) of ``test`` against ``ref`` over their common prefix.

    ``10*log10(P_signal / P_noise)`` with ``noise = test - ref`` — the per-row
    invariant from BASELINE.json input_hint (decoded-PCM allclose, SNR ≥ 30 dB).
    Identical signals → +inf; zero-power reference → -inf (never a duplicate).
    """
    n = min(ref.size, test.size)
    if n == 0:
        return float("-inf")
    r, t = ref[:n], test[:n]
    p_sig = float(np.dot(r, r))
    if p_sig < 1e-20:
        return float("-inf")
    noise = t - r
    p_noise = float(np.dot(noise, noise))
    if p_noise < 1e-20:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)
