"""Deterministic synthetic clips corpus with planted duplicate structure.

Implements FIXTURES.md §1: a corpus of ``clips(clip_id, bytes, sr_hz, dur_ms,
codec, transcript)`` rows with planted singleton / exact-dup / near-dup /
substring-dup / adversarial-skew groups, plus the ground-truth
``oracle_clusters(clip_id, cluster_id)`` table.

Scale design: clips are planned in independent fixed-size BLOCKS. Block b's
entire content is a pure function of ``(seed, b)`` — so generation distributes
over executors via ``spark.range(n_blocks) → mapInPandas`` with no driver-side
plan to ship, and the same corpus is reproduced identically at any parallelism
(the reference's seed-42 discipline, ``src/lsh.h:80``, generalized to a
partition-invariant scheme).

Skew rows come in two flavors (SURVEY.md §4.3.2 test design):
- flavor A: byte-identical silent clips with empty transcripts, repeated across
  every block → one giant global exact-dup cluster; exercises the
  content-hash short-circuit (O(n) star edges, never O(n²) pairs).
- flavor B: silent clips of *distinct* lengths with empty transcripts → every
  one collides into the all-ones SRP bucket in every table (zero fingerprint,
  sign(0)→1) but none is a true duplicate; exercises hot-band capping and
  exact-verification rejection.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from srpr_lsh_spark.kernels.audio import encode_pcm16_wav

ROLE_SINGLETON = "singleton"
ROLE_EXACT = "exact"
ROLE_NEAR = "near"
ROLE_SUBSTR = "substr"
ROLE_SKEW_A = "skew_identical"
ROLE_SKEW_B = "skew_distinct"

SKEW_A_CLUSTER = "skewA"
_SKEW_A_SR = 16000
_SKEW_A_DUR_MS = 1000

# bump when generated content changes: consumers that key caches on synth
# parameters must also key on this (e.g. __spark_entry__'s warehouse path)
SYNTH_VERSION = 2


@dataclass(frozen=True)
class SynthParams:
    n_clips: int = 5000
    seed: int = 42
    block_size: int = 200
    min_dur_ms: int = 500
    max_dur_ms: int = 5000
    # role mix (FIXTURES.md §1); fractions of *clips*, approximately
    p_exact: float = 0.15
    p_near: float = 0.10
    p_substr: float = 0.03
    p_skew: float = 0.02
    near_snr_db: float = 40.0   # per-clip planted SNR → pairwise ≥ ~37 dB

    @property
    def n_blocks(self) -> int:
        return (self.n_clips + self.block_size - 1) // self.block_size


def _vocab(seed: int, size: int = 512) -> "list[str]":
    rng = np.random.default_rng((seed, 777))
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(size):
        ln = int(rng.integers(3, 9))
        words.append("".join(rng.choice(letters, size=ln)))
    return words


def plan_block(block_id: int, params: SynthParams) -> "list[dict]":
    """Plan one block → list of group specs ``{role, size, gidx}`` covering
    exactly the block's clip slots. Pure function of (seed, block_id)."""
    start = block_id * params.block_size
    n = min(params.block_size, params.n_clips - start)
    if n <= 0:
        return []
    rng = np.random.default_rng((params.seed, 1000 + block_id))
    groups: list[dict] = []
    pos, gidx = 0, 0
    p = params
    roles = np.array([ROLE_EXACT, ROLE_NEAR, ROLE_SUBSTR, ROLE_SKEW_A, ROLE_SKEW_B, ROLE_SINGLETON])
    # probability of *starting* a group of each role, tuned so clip-mass
    # fractions approximate FIXTURES.md (group sizes differ per role)
    probs = np.array([p.p_exact / 3.5, p.p_near / 3.0, p.p_substr / 2.0,
                      p.p_skew / 2.0, p.p_skew / 2.0, 0.0])
    probs[-1] = max(0.0, 1.0 - probs[:-1].sum())
    while pos < n:
        role = str(rng.choice(roles, p=probs))
        if role == ROLE_EXACT:
            size = int(rng.integers(2, 6))
        elif role == ROLE_NEAR:
            size = int(rng.integers(2, 5))
        elif role == ROLE_SUBSTR:
            size = 2
        elif role in (ROLE_SKEW_A, ROLE_SKEW_B):
            size = int(rng.integers(2, 5))
        else:
            size = 1
        size = min(size, n - pos)
        if size == 1 and role != ROLE_SKEW_B:
            role = ROLE_SINGLETON if role != ROLE_SKEW_A else ROLE_SKEW_A
        groups.append({"role": role, "size": size, "gidx": gidx, "offset": pos})
        pos += size
        gidx += 1
    return groups


def _base_audio(rng: np.random.Generator, sr: int, n_samp: int) -> np.ndarray:
    t = np.arange(n_samp, dtype=np.float64) / sr
    sig = np.zeros(n_samp)
    # 2-4 dominant partials + a bed of weak partials: the weak bed gives every
    # clip a distinctive spectral fine structure (real audio is broadband), so
    # two different clips that happen to share dominant bands still have
    # fingerprint cosine well below the duplicate threshold — without it an
    # all-sinusoid corpus makes O(n²) "spectrum twins" (adversarially clean
    # spectra), which is the skew rows' job to test, not the whole corpus's.
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(100.0, min(3500.0, sr / 2 - 200)))
        a = float(rng.uniform(0.08, 0.25))
        ph = float(rng.uniform(0, 2 * np.pi))
        sig += a * np.sin(2 * np.pi * f * t + ph)
    for _ in range(16):
        f = float(rng.uniform(80.0, min(3800.0, sr / 2 - 100)))
        a = float(rng.uniform(0.02, 0.05))
        ph = float(rng.uniform(0, 2 * np.pi))
        sig += a * np.sin(2 * np.pi * f * t + ph)
    sig += rng.standard_normal(n_samp) * 1e-4  # clean-ish noise floor
    return sig


def _noisy_copy(rng: np.random.Generator, base: np.ndarray, snr_db: float) -> np.ndarray:
    noise = rng.standard_normal(base.size)
    p_sig = float(base @ base)
    p_noise = float(noise @ noise)
    if p_noise < 1e-30 or p_sig < 1e-30:
        return base.copy()
    noise *= np.sqrt(p_sig / p_noise) * 10 ** (-snr_db / 20.0)
    return base + noise


def generate_block(block_id: int, params: SynthParams, vocab: "list[str]",
                   with_audio: bool = True) -> pd.DataFrame:
    """Materialize one block → DataFrame with the clips schema + oracle columns
    ``cluster_id`` and ``role`` (callers project these off for the input table)."""
    groups = plan_block(block_id, params)
    start = block_id * params.block_size
    rows: list[dict] = []
    vocab_arr = np.array(vocab)
    for g in groups:
        rng = np.random.default_rng((params.seed, 2000 + block_id, g["gidx"]))
        first_idx = start + g["offset"]
        role, size = g["role"], g["size"]
        if role == ROLE_SKEW_A:
            blob = (encode_pcm16_wav(np.zeros(_SKEW_A_SR * _SKEW_A_DUR_MS // 1000), _SKEW_A_SR)
                    if with_audio else b"")
            for j in range(size):
                i = first_idx + j
                rows.append(dict(clip_id=f"clip{i:09d}", bytes=blob, sr_hz=_SKEW_A_SR,
                                 dur_ms=_SKEW_A_DUR_MS, codec="pcm_s16le", transcript="",
                                 cluster_id=SKEW_A_CLUSTER, role=role))
            continue
        if role == ROLE_SKEW_B:
            # near-silent rows with UNIQUE bytes (a single tiny impulse at a
            # position derived from the global clip index) but IDENTICAL
            # fingerprints: an impulse has a flat magnitude spectrum, so every
            # flavor-B row lands in the same SRP bucket of every table — the
            # planted hot band — while no two rows are true duplicates.
            for j in range(size):
                i = first_idx + j
                dur = _SKEW_A_DUR_MS
                n_samp = _SKEW_A_SR * dur // 1000
                sig = np.zeros(n_samp)
                if with_audio:
                    pos = (i * 2654435761) % n_samp
                    sig[pos] = (3 + (i % 5)) / 32767.0
                blob = encode_pcm16_wav(sig, _SKEW_A_SR) if with_audio else b""
                rows.append(dict(clip_id=f"clip{i:09d}", bytes=blob, sr_hz=_SKEW_A_SR,
                                 dur_ms=dur, codec="pcm_s16le", transcript="",
                                 cluster_id=f"clip{i:09d}", role=role))
            continue
        # content-bearing group: one base transcript + base audio
        sr = int(rng.choice([16000, 8000, 22050], p=[0.8, 0.1, 0.1]))
        dur_ms = int(rng.integers(params.min_dur_ms, params.max_dur_ms + 1))
        n_samp = sr * dur_ms // 1000
        n_words = int(rng.integers(25, 61)) if role in (ROLE_NEAR, ROLE_SUBSTR) \
            else int(rng.integers(5, 61))
        words = list(rng.choice(vocab_arr, size=n_words))
        base_text = " ".join(words)
        base_sig = _base_audio(rng, sr, n_samp) if with_audio else None
        cluster = f"clip{first_idx:09d}" if size > 1 else f"clip{first_idx:09d}"
        base_blob = encode_pcm16_wav(base_sig, sr) if with_audio else b""
        for j in range(size):
            i = first_idx + j
            cid = f"clip{i:09d}"
            if j == 0 or role == ROLE_EXACT:
                rows.append(dict(clip_id=cid, bytes=base_blob, sr_hz=sr, dur_ms=dur_ms,
                                 codec="pcm_s16le", transcript=base_text,
                                 cluster_id=cluster if size > 1 else cid, role=role))
            elif role == ROLE_NEAR:
                # edit 1-3 words, backing off deterministically until the
                # planted k-shingle Jaccard stays ≥ 0.85 (FIXTURES.md §1)
                from srpr_lsh_spark.kernels.hashing import shingle_hashes as _sh
                from srpr_lsh_spark.kernels.text import jaccard as _jac
                base_sh, _ = _sh([base_text.lower()], k=5)
                for n_edits in range(int(rng.integers(1, 4)), 0, -1):
                    w = list(words)
                    for _ in range(n_edits):
                        op = rng.choice(["sub", "del"])
                        if op == "sub" or len(w) < 10:
                            pos_ = int(rng.integers(0, len(w)))
                            w[pos_] = str(rng.choice(vocab_arr))
                        else:
                            del w[int(rng.integers(0, len(w)))]
                    var_sh, _ = _sh([" ".join(w).lower()], k=5)
                    if _jac(base_sh, var_sh) >= 0.85:
                        break
                else:
                    w = list(words)  # give up editing: exact copy still a dup
                blob = (encode_pcm16_wav(_noisy_copy(rng, base_sig, params.near_snr_db), sr)
                        if with_audio else b"")
                rows.append(dict(clip_id=cid, bytes=blob, sr_hz=sr, dur_ms=dur_ms,
                                 codec="pcm_s16le", transcript=" ".join(w),
                                 cluster_id=cluster, role=role))
            else:  # ROLE_SUBSTR: contiguous word slice + trimmed audio prefix
                frac = float(rng.uniform(0.4, 0.7))
                sub_len = max(5, int(len(words) * frac))
                s0 = int(rng.integers(0, len(words) - sub_len + 1))
                sub_text = " ".join(words[s0 : s0 + sub_len])
                sub_dur = max(100, int(dur_ms * frac))
                sub_samp = sr * sub_dur // 1000
                blob = encode_pcm16_wav(base_sig[:sub_samp], sr) if with_audio else b""
                rows.append(dict(clip_id=cid, bytes=blob, sr_hz=sr, dur_ms=sub_dur,
                                 codec="pcm_s16le", transcript=sub_text,
                                 cluster_id=cluster, role=role))
    return pd.DataFrame(rows)


def synthesize_clips(spark, params: SynthParams, out_dir: "str | None" = None):
    """Distributed deterministic synthesis via mapInPandas over block ids.

    Returns ``(clips_df, oracle_df)``; if ``out_dir`` is given, writes
    ``{out_dir}/clips`` and ``{out_dir}/oracle_clusters`` parquet and re-reads
    them (so downstream stages scan parquet exactly like production).
    """
    from pyspark.sql import functions as F
    from srpr_lsh_spark.sources.readers import clips_schema

    vocab = _vocab(params.seed)
    full_schema = clips_schema().add("cluster_id", "string").add("role", "string")

    def gen(batches):
        for pdf in batches:
            for bid in pdf["id"].tolist():
                out = generate_block(int(bid), params, vocab)
                if len(out):
                    yield out

    blocks = spark.range(params.n_blocks).repartition(
        min(params.n_blocks, spark.sparkContext.defaultParallelism * 2)
    )
    full = blocks.mapInPandas(gen, schema=full_schema)
    clips = full.drop("cluster_id", "role")
    oracle = full.select("clip_id", "cluster_id", "role")
    if out_dir:
        # idempotent per (params, SYNTH_VERSION): a manifest-matched corpus is
        # reused, NOT rewritten. A rewrite would mint new part-file names,
        # which changes the pipeline's resume input_key and silently
        # invalidates every checkpointed stage — the r5 entry() double-run
        # probe caught exactly that (second call recomputed all stages and
        # deleted the first result's files out from under it).
        import dataclasses as _dc
        import json as _json

        mpath = f"{out_dir}/_synth_manifest.json"
        want = {"version": SYNTH_VERSION, "params": _dc.asdict(params)}
        have = None
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    have = _json.load(f)
            except (OSError, ValueError):
                have = None
        if have != want:
            full.write.mode("overwrite").parquet(f"{out_dir}/clips_full")
            os.makedirs(out_dir, exist_ok=True)
            with open(mpath, "w") as f:
                _json.dump(want, f)
        full_r = spark.read.parquet(f"{out_dir}/clips_full")
        clips = full_r.drop("cluster_id", "role")
        oracle = full_r.select("clip_id", "cluster_id", "role")
    return clips, oracle
