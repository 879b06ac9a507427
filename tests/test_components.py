"""Connected components vs a union-find oracle on random graphs, plus the
adversarial over-cap star-bucket fixture (VERDICT r1 #8)."""

import dataclasses

import numpy as np
import pytest

from srpr_lsh_spark.operators.components import connected_components


def _uf_oracle(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(spark, nodes, edges, max_iters=25):
    ndf = spark.createDataFrame([(n,) for n in nodes], ["clip_id"])
    if edges:
        edf = spark.createDataFrame(list(edges), ["a", "b"])
    else:
        edf = ndf.select(
            ndf.clip_id.alias("a"), ndf.clip_id.alias("b")
        ).limit(0)
    got = {
        r["clip_id"]: r["cluster_id"]
        for r in connected_components(edf, ndf, max_iters=max_iters).collect()
    }
    return got


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    n = 120
    nodes = [f"n{i:04d}" for i in range(n)]
    m = int(rng.integers(30, 140))
    edges = {
        tuple(sorted((nodes[int(rng.integers(0, n))], nodes[int(rng.integers(0, n))])))
        for _ in range(m)
    }
    edges = {(a, b) for a, b in edges if a != b}
    assert _run(spark, nodes, edges) == _uf_oracle(nodes, edges)


def test_long_chain(spark):
    """A path graph — worst-case diameter — must still converge in O(log n)."""
    n = 64
    nodes = [f"c{i:03d}" for i in range(n)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    got = _run(spark, nodes, edges, max_iters=12)
    assert set(got.values()) == {nodes[0]}


def test_no_edges_all_singletons(spark):
    nodes = [f"s{i}" for i in range(10)]
    got = _run(spark, nodes, [])
    assert got == {x: x for x in nodes}


def test_giant_star(spark):
    """The exact-content short-circuit shape: one hub, many leaves."""
    nodes = [f"h{i:05d}" for i in range(200)]
    edges = [(nodes[0], x) for x in nodes[1:]]
    got = _run(spark, nodes, edges)
    assert set(got.values()) == {nodes[0]}


class TestOverCapStarBucket:
    """Adversarial hot-bucket fixture: a >cap bucket whose MIN anchor is
    dissimilar to every true member. With single-anchor star pairing the
    whole family would be stranded (every (min, member) edge fails exact
    verification); the two-anchor star recovers it via the max anchor."""

    IDS = [f"c{i:02d}" for i in range(20)]

    def _pairs(self, spark, cap=8):
        from srpr_lsh_spark.config import DedupConfig
        from srpr_lsh_spark.operators.banding import candidate_pairs

        cfg = dataclasses.replace(DedupConfig(shuffle_partitions=8), bucket_pair_cap=cap)
        bands = spark.createDataFrame(
            [(i, 0, 42, "minhash") for i in self.IDS],
            ["clip_id", "band_id", "band_hash", "source"],
        )
        return candidate_pairs(bands, cfg), cfg

    def test_edges_to_both_anchors_linear_count(self, spark):
        pairs, _ = self._pairs(spark)
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        for m in self.IDS[1:]:
            assert ("c00", m) in got, f"missing min-anchor edge for {m}"
        for m in self.IDS[:-1]:
            assert (m, "c19") in got, f"missing max-anchor edge for {m}"
        # O(n) star edges, not the O(n²) all-pairs join
        assert len(got) == 2 * (len(self.IDS) - 1) - 1
        assert len(got) < len(self.IDS) * (len(self.IDS) - 1) / 2

    def test_family_recovered_despite_junk_min_anchor(self, spark):
        from srpr_lsh_spark.operators.verify import verify_text_pairs

        pairs, cfg = self._pairs(spark)
        family = (
            "the quick brown fox jumps over the lazy dog again and again "
            "while the band keeps playing the same old song all night long"
        )
        texts = {"c00": "zzz completely unrelated gibberish qqq www eee rrr ttt yyy"}
        for m in self.IDS[1:]:
            texts[m] = family
        clips = spark.createDataFrame(
            [(i, texts[i]) for i in self.IDS], ["clip_id", "transcript"]
        )
        verified = verify_text_pairs(pairs, clips, cfg)
        nodes = spark.createDataFrame([(i,) for i in self.IDS], ["clip_id"])
        labels = {
            r["clip_id"]: r["cluster_id"]
            for r in connected_components(
                verified.select("a", "b"), nodes
            ).collect()
        }
        # the junk min anchor stays a singleton; the 19 true members cluster
        assert labels["c00"] == "c00"
        family_labels = {labels[m] for m in self.IDS[1:]}
        assert family_labels == {"c01"}
