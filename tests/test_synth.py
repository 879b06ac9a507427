"""Synthesizer invariants — FIXTURES.md §1/§4: planted SNR, transcript
equality, shingle Jaccard of near groups, substring containment, determinism."""

import numpy as np
import pandas as pd
import pytest

from srpr_lsh_spark.kernels import decode_pcm16_wav, jaccard, pair_snr_db, shingle_hashes
from srpr_lsh_spark.sources.synth import (
    ROLE_EXACT,
    ROLE_NEAR,
    ROLE_SKEW_A,
    ROLE_SKEW_B,
    ROLE_SUBSTR,
    SKEW_A_CLUSTER,
    SynthParams,
    _vocab,
    generate_block,
)

PARAMS = SynthParams(n_clips=600, block_size=200, seed=42)


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    vocab = _vocab(PARAMS.seed)
    return pd.concat(
        [generate_block(b, PARAMS, vocab) for b in range(PARAMS.n_blocks)],
        ignore_index=True,
    )


def test_counts_and_schema(corpus):
    assert len(corpus) == PARAMS.n_clips
    assert corpus["clip_id"].is_unique
    assert set(corpus.columns) == {
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
        "cluster_id", "role",
    }
    assert (corpus["codec"] == "pcm_s16le").all()


def test_role_mix_roughly_planted(corpus):
    frac = corpus["role"].value_counts(normalize=True)
    assert frac.get(ROLE_EXACT, 0) > 0.05
    assert frac.get(ROLE_NEAR, 0) > 0.04
    assert frac.get(ROLE_SUBSTR, 0) > 0.005
    assert frac.get(ROLE_SKEW_A, 0) > 0.002
    assert frac.get(ROLE_SKEW_B, 0) > 0.002


def test_determinism(corpus):
    again = generate_block(1, PARAMS, _vocab(PARAMS.seed))
    first = corpus[corpus["clip_id"].str.startswith("clip0000002")
                   | (corpus["clip_id"].astype(str) >= "clip000000200")]
    block1 = corpus.iloc[200:400].reset_index(drop=True)
    pd.testing.assert_frame_equal(block1, again.reset_index(drop=True))


def test_exact_groups_identical(corpus):
    ex = corpus[corpus["role"] == ROLE_EXACT]
    for cid, grp in ex.groupby("cluster_id"):
        assert grp["transcript"].nunique() == 1
        assert grp["bytes"].map(bytes).nunique() == 1


def test_near_groups_snr_and_jaccard(corpus):
    near = corpus[corpus["role"] == ROLE_NEAR]
    n_groups = 0
    for cid, grp in near.groupby("cluster_id"):
        grp = grp.sort_values("clip_id")
        base = grp.iloc[0]
        base_pcm = decode_pcm16_wav(bytes(base["bytes"]))
        bflat, boff = shingle_hashes([base["transcript"]], k=5)
        bset = bflat
        for _, row in grp.iloc[1:].iterrows():
            pcm = decode_pcm16_wav(bytes(row["bytes"]))
            snr = pair_snr_db(base_pcm, pcm)
            assert snr >= 30.0, f"planted pair SNR {snr} < 30 dB in {cid}"
            rflat, _ = shingle_hashes([row["transcript"]], k=5)
            j = jaccard(bset, rflat)
            assert j >= 0.8, f"planted near-dup Jaccard {j} < 0.8 in {cid}"
        n_groups += 1
    assert n_groups >= 3


def test_substr_groups_containment(corpus):
    sub = corpus[corpus["role"] == ROLE_SUBSTR]
    n = 0
    for cid, grp in sub.groupby("cluster_id"):
        grp = grp.sort_values("clip_id")
        long_t = grp.iloc[0]["transcript"]
        short_t = grp.iloc[1]["transcript"]
        assert short_t in long_t
        long_pcm = decode_pcm16_wav(bytes(grp.iloc[0]["bytes"]))
        short_pcm = decode_pcm16_wav(bytes(grp.iloc[1]["bytes"]))
        assert np.array_equal(short_pcm, long_pcm[: short_pcm.size])
        n += 1
    assert n >= 1


def test_skew_rows(corpus):
    a = corpus[corpus["role"] == ROLE_SKEW_A]
    b = corpus[corpus["role"] == ROLE_SKEW_B]
    assert len(a) >= 2 and len(b) >= 2
    assert (a["cluster_id"] == SKEW_A_CLUSTER).all()
    assert a["bytes"].map(bytes).nunique() == 1
    assert (a["transcript"] == "").all() and (b["transcript"] == "").all()
    # flavor B rows are all-distinct content → each its own oracle cluster
    assert (b["cluster_id"] == b["clip_id"]).all()
    assert b["bytes"].map(bytes).nunique() == len(b)
    from srpr_lsh_spark.kernels.audio import fingerprint
    fps = [fingerprint(decode_pcm16_wav(bytes(blob))) for blob in b["bytes"]]
    for blob in b["bytes"].head(5):
        assert np.abs(decode_pcm16_wav(bytes(blob))).max() <= 8 / 32767
    # identical fingerprints → the planted hot SRP band
    for f in fps[1:]:
        assert np.allclose(f, fps[0], atol=1e-5)


def test_spark_synthesis_matches_local(spark, tmp_path):
    from srpr_lsh_spark.sources.synth import synthesize_clips

    params = SynthParams(n_clips=400, block_size=100, seed=42)
    clips, oracle = synthesize_clips(spark, params, out_dir=str(tmp_path))
    assert clips.count() == 400
    assert oracle.count() == 400
    assert clips.select("clip_id").distinct().count() == 400
    row = clips.filter("clip_id = 'clip000000123'").collect()[0]
    vocab = _vocab(42)
    local = generate_block(1, params, vocab)
    lrow = local[local["clip_id"] == "clip000000123"].iloc[0]
    assert row["transcript"] == lrow["transcript"]
    assert bytes(row["bytes"]) == bytes(lrow["bytes"])
