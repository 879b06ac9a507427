"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end dedup (synthetic clips corpus →
clusters). ``queries()`` exposes one entry per implemented operator family
(SURVEY.md §2); SQL-expressible ones have matching ``oracle_sql()`` strings the
driver checks against DuckDB; LSH/UDF stages are rows-only (their exactness is
pinned by the pytest oracles in tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from srpr_lsh_spark.config import DedupConfig, tune_allocator_env

# allocator tuning must precede python-worker forks (workers inherit env);
# harmless no-op if workers already exist — only new forks benefit
tune_allocator_env()
from srpr_lsh_spark.functions.parity import ORACLE_QUERIES
from srpr_lsh_spark.plans import documents as docq
from srpr_lsh_spark.plans.pipeline import run_dedup
from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips

_CFG = DedupConfig()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full near-dup pipeline (MinHash + SimHash + substring +
    exact short-circuit → verified pairs → connected components) on a small
    deterministic clips corpus; returns the non-singleton clusters."""
    from srpr_lsh_spark.sources.synth import SYNTH_VERSION

    params = SynthParams(n_clips=400, block_size=100, seed=42,
                         min_dur_ms=300, max_dur_ms=1200)
    wh_root = os.environ.get("SPARK_GRAFT_WH", "/tmp/srpr_lsh_spark_entry")
    # key the cache dir on synth version + config so a generator or config
    # change can never resume against a stale corpus
    tag = f"v{SYNTH_VERSION}_{_CFG.config_hash()}"
    clips, _oracle = synthesize_clips(spark, params, out_dir=f"{wh_root}/data_{tag}")
    res = run_dedup(spark, clips, _CFG, warehouse_dir=f"{wh_root}/wh_{tag}")
    clusters = res["clusters"]
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        clusters.join(sizes, "cluster_id")
        .filter(F.col("cluster_size") >= 2)
        .select("clip_id", "cluster_id", "cluster_size")
        .orderBy("clip_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in ORACLE_QUERIES.items():
        out[name] = fn
    # non-SQL-expressible LSH/UDF stages → rows-only driver checks
    out["minhash_signatures"] = lambda s, d: docq.minhash_signature_table(s, d, _CFG)
    out["band_bucket_histogram"] = lambda s, d: docq.band_bucket_histogram(s, d, _CFG)
    out["near_dup_pairs_documents"] = lambda s, d: docq.near_dup_pairs_documents(
        s, d, _CFG, threshold=0.5
    )
    out["ann_lsh_topk"] = lambda s, d: docq.ann_lsh_topk_embeddings(s, d, _CFG)
    out["ann_eval"] = lambda s, d: docq.ann_eval_embeddings(s, d, _CFG)
    # model training (iterative — rows-only; math pinned by tests/test_ml.py)
    from srpr_lsh_spark.plans import training as tr

    out["bpr_training"] = lambda s, d: tr.bpr_training_curve(s, d, _CFG)
    out["srpr_training"] = lambda s, d: tr.srpr_training_curve(s, d, _CFG)
    out["model_hash_sweep"] = lambda s, d: tr.model_hash_sweep(s, d, _CFG)
    # the paper's core claim on the HARD (angle-graded) geometry: SRPR's
    # hash_degradation < BPR's at every grid point (pinned by
    # tests/test_ml.py::test_srpr_beats_bpr_on_angle_geometry)
    out["embedding_hash_sweep"] = lambda s, d: tr.embedding_hash_sweep(s, d, _CFG)
    # the /api/recommend serving payload (app.cpp:205-272): 4-way
    # BPR/SRPR x brute/LSH comparison with per-retrieval timings
    from srpr_lsh_spark.plans.serving import recommend_for_sf

    out["recommend_user"] = lambda s, d: recommend_for_sf(s, d, _CFG)
    # the nRecall experiment binary (data_collection/nRecall.cpp): true
    # max-rated nRecall over trained models per (bits, k)
    from srpr_lsh_spark.plans.sweep import nrecall_vs_k

    out["nrecall_vs_k"] = lambda s, d: nrecall_vs_k(s, d, seed=_CFG.seed)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ORACLE_QUERIES.items()}
