"""Reference-shaped micro-fixtures (FIXTURES.md §3): pin the reference's
behaviors with hand-checked expectations."""

import math

import numpy as np
import pytest

from srpr_lsh_spark.functions.metrics import average_metrics, retrieval_metrics
from srpr_lsh_spark.kernels.hashing import srp_keys, srp_planes
from srpr_lsh_spark.operators.triplets import generate_triplets


class TestTripletsMicro:
    """ratings_micro — src/Triplet.h:155-172 semantics."""

    def _ratings(self, spark):
        rows = [
            (1, 1, 5.0), (1, 2, 3.0), (1, 3, 4.5),   # 3 pairs, all |Δ|>=0.5
            (2, 9, 4.0),                               # <2 ratings → dropped
            (3, 7, 4.0), (3, 8, 4.0),                  # Δ=0 < 0.5 → no triplet
        ]
        return spark.createDataFrame(rows, ["user_id", "item_id", "rating"])

    def test_orientation_and_threshold(self, spark):
        t = generate_triplets(self._ratings(spark), max_per_user=None)
        got = {(r["user_id"], r["pos_item"], r["neg_item"]) for r in t.collect()}
        assert got == {(1, 1, 2), (1, 1, 3), (1, 3, 2)}

    def test_cap_is_deterministic(self, spark):
        r = self._ratings(spark)
        t1 = {(x["user_id"], x["pos_item"], x["neg_item"])
              for x in generate_triplets(r, max_per_user=2).collect()}
        t2 = {(x["user_id"], x["pos_item"], x["neg_item"])
              for x in generate_triplets(r.repartition(5), max_per_user=2).collect()}
        assert t1 == t2 and len(t1) == 2
        full = {(1, 1, 2), (1, 1, 3), (1, 3, 2)}
        assert t1 <= full


class TestMetricsMicro:
    """metrics_micro — src/MetricsCalculator.h:81-184 hand computation."""

    def test_single_query_values(self, spark):
        truth = spark.createDataFrame(
            [(0, i) for i in (1, 2, 3, 4, 5)], ["query_id", "item_id"]
        )
        results = spark.createDataFrame(
            [(0, 1, 1), (0, 9, 2), (0, 3, 3), (0, 8, 4), (0, 5, 5)],
            ["query_id", "item_id", "rnk"],
        )
        m = retrieval_metrics(results, truth, k=5).collect()[0]
        assert m["precision_at_k"] == pytest.approx(3 / 5)
        assert m["recall_at_k"] == pytest.approx(3 / 5)
        # hits at ranks 1,3,5 → AP = (1 + 2/3 + 3/5)/3 — the reference divides
        # by the hit count (MetricsCalculator.h:168), not min(n_truth, k)
        assert m["ap_at_k"] == pytest.approx((1 + 2 / 3 + 3 / 5) / 3)
        dcg = 1 / math.log2(2) + 1 / math.log2(4) + 1 / math.log2(6)
        idcg = sum(1 / math.log2(i + 1) for i in range(1, 6))
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg)

    def test_nrecall_hand_computed(self, spark):
        """nRecall (MetricsCalculator.h:89-138,245-258) by hand:
        user 0: max-rated {1,2,3}; retrieved@2 hits {1,3} → 2/min(2,3) = 1.0
        user 1: max-rated {7}; retrieved@2 misses it → 0/min(2,1) = 0.0
        user 2: NO max-rated items → excluded (Umax conditional)
        avg over Umax users = 0.5."""
        from srpr_lsh_spark.functions.metrics import nrecall_at_k

        ratings = spark.createDataFrame(
            [(0, 1, 5.0), (0, 2, 5.0), (0, 3, 5.0), (0, 4, 2.0),
             (1, 7, 5.0), (1, 8, 3.0),
             (2, 1, 4.0), (2, 2, 3.0)],
            ["query_id", "item_id", "rating"],
        )
        results = spark.createDataFrame(
            [(0, 1, 1), (0, 3, 2), (0, 2, 3),   # rnk 3 is beyond k=2
             (1, 8, 1), (1, 9, 2),
             (2, 1, 1), (2, 2, 2)],
            ["query_id", "item_id", "rnk"],
        )
        rows = {r["query_id"]: r for r in nrecall_at_k(
            results, ratings, max_rating_value=5.0, k=2
        ).collect()}
        assert set(rows) == {0, 1}  # user 2 excluded
        assert rows[0]["n_max_rated"] == 3 and rows[0]["hits"] == 2
        assert rows[0]["n_recall_at_k"] == pytest.approx(1.0)
        assert rows[1]["n_recall_at_k"] == pytest.approx(0.0)

    def test_nrecall_short_retrieval_normalizes_by_actual_count(self, spark):
        """MetricsCalculator.h:121 sets k = lsh_results.size() — the ACTUAL
        retrieved-list length. A user whose retrieval returned only 2 rows
        at nominal k=10 is normalized by min(2, n_max), and a Umax user with
        zero retrieved rows scores 0.0 (ideal>0 guard)."""
        from srpr_lsh_spark.functions.metrics import nrecall_at_k

        ratings = spark.createDataFrame(
            [(0, i, 5.0) for i in (1, 2, 3, 4, 5)] + [(1, 7, 5.0)],
            ["query_id", "item_id", "rating"],
        )
        results = spark.createDataFrame(  # user 0: 2 rows, 1 hit; user 1: none
            [(0, 1, 1), (0, 9, 2)], ["query_id", "item_id", "rnk"]
        )
        rows = {r["query_id"]: r for r in nrecall_at_k(
            results, ratings, max_rating_value=5.0, k=10
        ).collect()}
        assert rows[0]["hits"] == 1
        # 1 / min(n_retrieved=2, n_max=5) — NOT 1 / min(k=10, 5)
        assert rows[0]["n_recall_at_k"] == pytest.approx(0.5)
        assert rows[1]["n_recall_at_k"] == 0.0

    def test_empty_result_query_scores_zero(self, spark):
        """A query whose retrieval returns nothing still counts in the macro
        averages with zero metrics (MetricsCalculator.h:142-145)."""
        truth = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 1), (1, 2)], ["query_id", "item_id"]
        )
        results = spark.createDataFrame(  # query 1 retrieves nothing
            [(0, 1, 1), (0, 2, 2)], ["query_id", "item_id", "rnk"]
        )
        per_q = retrieval_metrics(results, truth, k=2)
        rows = {r["query_id"]: r for r in per_q.collect()}
        assert set(rows) == {0, 1}
        assert rows[1]["precision_at_k"] == 0.0
        assert rows[1]["recall_at_k"] == 0.0
        assert rows[1]["ap_at_k"] == 0.0
        assert rows[1]["ndcg_at_k"] == 0.0
        avg = average_metrics(per_q).collect()[0]
        assert avg["n_queries"] == 2
        assert avg["avg_precision"] == pytest.approx(0.5)

    def test_graded_relevance_dcg(self, spark):
        """truth with a ``rel`` column → rating-graded DCG like the
        reference's calculate_dcg (MetricsCalculator.h:89-113)."""
        truth = spark.createDataFrame(
            [(0, 1, 3.0), (0, 2, 1.0)], ["query_id", "item_id", "rel"]
        )
        results = spark.createDataFrame(  # retrieved in the WRONG order
            [(0, 2, 1), (0, 1, 2)], ["query_id", "item_id", "rnk"]
        )
        m = retrieval_metrics(results, truth, k=2).collect()[0]
        dcg = 1.0 / math.log2(2) + 3.0 / math.log2(3)
        idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg)
        assert m["precision_at_k"] == pytest.approx(1.0)  # hit counting stays binary

    def test_perfect_retrieval(self, spark):
        truth = spark.createDataFrame([(0, i) for i in range(5)], ["query_id", "item_id"])
        results = spark.createDataFrame(
            [(0, i, i + 1) for i in range(5)], ["query_id", "item_id", "rnk"]
        )
        avg = average_metrics(retrieval_metrics(results, truth, k=5)).collect()[0]
        assert avg["avg_precision"] == 1.0
        assert avg["avg_recall"] == 1.0
        assert avg["map_at_k"] == 1.0
        assert avg["avg_ndcg"] == 1.0
        assert avg["n_queries"] == 1


class TestVectorsMicro:
    """vectors_micro — SRP hash bits vs hand-computed hyperplane signs
    (src/plane.h:16-22, src/lsh.h:65-73)."""

    def test_keys_match_manual_signs(self):
        planes = srp_planes(4, tables=2, bits=8, seed=42)
        x = np.random.default_rng(7).standard_normal((8, 4)).astype(np.float32)
        keys = srp_keys(x, planes, tables=2, bits=8)
        signs = (x @ planes.T) >= 0  # (8, 16)
        for row in range(8):
            for t in range(2):
                bits = signs[row, t * 8 : (t + 1) * 8]
                manual = int("".join("1" if b else "0" for b in bits), 2)
                assert keys[row, t] == manual


class TestCsvScan:
    """CSV scan with schema + row-limit pushdown (src/Triplet.h:84-122)."""

    def test_read_with_limit(self, spark, tmp_path):
        from srpr_lsh_spark.sources.readers import read_ratings_csv

        p = tmp_path / "ratings.csv"
        p.write_text(
            "userId,movieId,rating,timestamp\n"
            + "\n".join(f"{u},{m},{3.5},{1000+u}" for u in range(10) for m in range(3))
        )
        df = read_ratings_csv(spark, str(p), max_ratings=7)
        assert df.count() == 7
        assert df.schema["rating"].dataType.typeName() == "double"
        full = read_ratings_csv(spark, str(p))
        assert full.count() == 30

    def test_read_triplets_header_sniff(self, spark, tmp_path):
        """load_triplets (src/Triplet.h:29-81): (user,pos,neg) rows load
        identically whether or not the file carries a header line — the
        declarative analogue of the reference's line-1 substring sniff."""
        from srpr_lsh_spark.sources.readers import read_triplets_csv

        rows = [(1, 10, 20), (1, 11, 21), (2, 12, 22)]
        body = "\n".join(f"{u},{p_},{n}" for u, p_, n in rows)
        with_h = tmp_path / "t_header.csv"
        with_h.write_text("user_id,preferred_item_id,less_preferred_item_id\n" + body)
        without_h = tmp_path / "t_plain.csv"
        without_h.write_text(body)
        got_h = sorted(map(tuple, read_triplets_csv(spark, str(with_h)).collect()))
        got_p = sorted(map(tuple, read_triplets_csv(spark, str(without_h)).collect()))
        assert got_h == got_p == sorted(rows)
        df = read_triplets_csv(spark, str(with_h))
        assert [f.dataType.typeName() for f in df.schema.fields] == ["long"] * 3


class TestSweep:
    """Experiment-sweep harness — data_collection/{speedup,recall}.cpp parity:
    recall falls and scan_ratio shrinks as bits grow."""

    def test_bits_tradeoff(self, spark):
        from srpr_lsh_spark.plans.sweep import sweep_bits

        df = sweep_bits(
            spark, "/root/testdata/sf0.001", bits_grid=(4, 12), k_grid=(10,),
            n_queries=15,
        ).toPandas().sort_values("bits").reset_index(drop=True)
        assert len(df) == 2
        assert df.loc[0, "avg_recall"] > df.loc[1, "avg_recall"]
        assert df.loc[0, "scan_ratio"] > df.loc[1, "scan_ratio"]
        assert (df["avg_ndcg"] >= df["avg_recall"] - 1e-9).all()

    def test_derived_table_count_and_csv_sink(self, spark, tmp_path):
        """tables=None → L = ceil(log2(n_items)) (speedup.cpp:56) and the
        bits,speedup,nRecall@10 CSV matches the reference sink schema
        (speedup.cpp:60-68)."""
        import math

        from srpr_lsh_spark.plans.sweep import speedup_csv, sweep_bits

        sf = "/root/testdata/sf0.001"
        df = sweep_bits(spark, sf, bits_grid=(8,), k_grid=(10,), tables=None,
                        n_queries=10).toPandas()
        n_items = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        assert df.loc[0, "tables"] == math.ceil(math.log2(n_items))

        p = str(tmp_path / "speedup.csv")
        out = speedup_csv(spark, sf, p, bits_grid=(4, 8), n_queries=10).toPandas()
        assert list(out.columns) == ["bits", "speedup", "nRecall@10"]
        with open(p) as f:
            assert f.readline().strip() == "bits,speedup,nRecall@10"
        assert (out["speedup"] >= 1.0).all()
        # fewer bits → bigger buckets → more candidates scanned → less speedup
        assert out.loc[0, "speedup"] <= out.loc[1, "speedup"]
