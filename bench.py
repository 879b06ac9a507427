#!/usr/bin/env python
"""Benchmark driver.

Default mode (what the per-round driver runs): one JSON line with the headline
end-to-end dedup time on a deterministic synthetic clips corpus scaled to the
target sf, plus per-query seconds for representative relational queries at
``$SPARK_GRAFT_SF_DIR``.

    python bench.py                       # sf from $SPARK_GRAFT_SF_DIR, local[$SPARK_GRAFT_CPUS]
    python bench.py --cpus 8              # pin parallelism
    python bench.py --scaling             # run the N vs 4N parallelism study
                                          # (local[8] vs local[32]) and write BENCH/BASELINE.md

Scaling evidence (BASELINE.json north_rule; no real cluster in this sandbox):
the identical job at two parallelism levels on the same input, reporting
throughput at both and efficiency = (T_8 / T_32) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = (
    "pricing_summary",
    "join_dims",
    "topk_per_group",
    "dcg",
    "exact_dedup",
    "ngram_jaccard",
    "embedding_cosine_topk",
    "near_dup_pairs_documents",
)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _scratch_dir() -> str:
    # tmpfs when available: the bench corpus is synthetic scratch, and the
    # host's disk adds noise that swamps scaling measurements
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _session(cpus: int, shuffle_partitions: "int | None" = None):
    from pyspark.sql import SparkSession

    from srpr_lsh_spark.config import tune_allocator_env

    tune_allocator_env()  # before JVM launch: python workers inherit it

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"srpr-lsh-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # wide binary rows: bound each python worker's per-batch buffer
        # (2048 clips ≈ 60 MB in + decode scratch). With the allocator tuning
        # (config.tune_allocator_env) batches this size recycle arena pages
        # instead of re-faulting fresh mmap'd ones every batch.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # the verify-stage lookup sides (fingerprints/sketches) are tens of MB
        # at bench scale — broadcasting them removes the candidate-pair
        # shuffles; at petabyte scale AQE falls back to SMJ on its own
        .config("spark.sql.autoBroadcastJoinThreshold", "128m")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", os.path.join(_scratch_dir(), f"spark_local_{cpus}"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _pair_quality(clusters_df, oracle_df) -> dict:
    """Cluster-level dup-pair recall/precision vs the planted oracle,
    computed relationally (pair-counting over the contingency table) — no
    driver-side O(|cluster|²) enumeration, so a 10⁶-member skew cluster costs
    one small groupBy, not 10¹² python pairs.

    agree = Σ_cells C(n,2); got = Σ_g C(n_g,2); want = Σ_w C(n_w,2) where the
    cells are (got_cluster, want_cluster) intersections over the joined
    assignments. recall = agree/want, precision = agree/got.
    """
    from pyspark.sql import functions as F

    j = clusters_df.select("clip_id", F.col("cluster_id").alias("g")).join(
        oracle_df.select("clip_id", F.col("cluster_id").alias("w")), "clip_id"
    )
    cells = j.groupBy("g", "w").agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    c2 = lambda c: F.sum(F.col(c) * (F.col(c) - 1) / 2)
    agree = cells.agg(c2("n").alias("x")).first()["x"] or 0.0
    got = cells.groupBy("g").agg(F.sum("n").alias("n")).agg(c2("n").alias("x")).first()["x"] or 0.0
    want = cells.groupBy("w").agg(F.sum("n").alias("n")).agg(c2("n").alias("x")).first()["x"] or 0.0
    recall = agree / max(want, 1.0)
    precision = agree / max(got, 1.0)
    return {
        "dup_pair_recall": round(recall, 5),
        "dup_pair_precision": round(precision, 5),
        "oracle_pairs": int(want),
    }


def bench_once(sf_dir: str, cpus: int, n_clips: "int | None" = None,
               shuffle_partitions: "int | None" = None,
               skip_queries: bool = False,
               data_dir: "str | None" = None) -> dict:
    from srpr_lsh_spark.config import DedupConfig
    from srpr_lsh_spark.plans.pipeline import run_dedup
    from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips

    sf = _sf_of(sf_dir)
    if n_clips is None:
        n_clips = max(2000, int(sf * 200_000))  # sf0.1 → 20k clips
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    spark = _session(cpus, shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(shuffle_partitions=shuffle_partitions)
    tmp = tempfile.mkdtemp(prefix="srpr_bench_", dir=_scratch_dir())
    out: dict = {"sf": sf, "cpus": cpus, "n_clips": n_clips}
    try:
        t0 = time.time()
        if data_dir:
            # pre-synthesized shared corpus (scaling studies: both
            # parallelism levels must read the IDENTICAL input)
            full = spark.read.parquet(f"{data_dir}/clips_full")
            clips = full.drop("cluster_id", "role")
            oracle = full.select("clip_id", "cluster_id", "role")
        else:
            params = SynthParams(
                n_clips=n_clips, block_size=250, seed=42,
                min_dur_ms=300, max_dur_ms=1200,
            )
            clips, oracle = synthesize_clips(spark, params, out_dir=f"{tmp}/data")
        out["synth_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        res = run_dedup(spark, clips, cfg, warehouse_dir=f"{tmp}/wh", resume=False)
        n_clusters = res["clusters"].select("cluster_id").distinct().count()
        dedup_sec = time.time() - t0
        out["dedup_sec"] = round(dedup_sec, 2)
        out["clips_per_sec"] = round(n_clips / dedup_sec, 1)
        out["n_clusters"] = n_clusters
        out["stage_secs"] = res.get("stage_secs", {})
        # BASELINE.json acceptance metric: dup-pair recall / precision vs the
        # planted oracle clusters (computed outside the timed window)
        out.update(_pair_quality(res["clusters"], oracle))

        # relational queries at the driver's sf dir (skipped in scaling runs:
        # they time fixed small-data work that only adds noise exposure there)
        out["queries"] = {}
        if not skip_queries:
            import __spark_entry__ as em

            qs = em.queries()
            for name in BENCH_QUERIES:
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                out["queries"][name] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return out


def _one_scaling_run(sf_dir: str, cpus: int, n_clips: int, data_dir: str) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--sf-dir", sf_dir, "--cpus", str(cpus),
        "--n-clips", str(n_clips), "--json-only",
        "--shuffle-partitions", "64", "--skip-queries",
        "--data-dir", data_dir,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [
        l for l in proc.stdout.strip().splitlines()
        if l.startswith("{") and '"metric"' in l
    ][-1]
    return json.loads(line)


def _synthesize_shared_corpus(sf_dir: str, n_clips: int) -> str:
    """One corpus for the whole study, synthesized once at high parallelism."""
    from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips

    data_dir = tempfile.mkdtemp(prefix="srpr_scaling_data_", dir=_scratch_dir())
    spark = _session(16, 64)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        params = SynthParams(n_clips=n_clips, block_size=250, seed=42,
                             min_dur_ms=300, max_dur_ms=1200)
        synthesize_clips(spark, params, out_dir=data_dir)
    finally:
        spark.stop()
    return data_dir


def run_scaling(sf_dir: str, n_clips: int = 20000, n_lo: int = 4, n_hi: int = 16,
                reps: int = 3) -> None:
    """Identical job at local[n_lo] and local[n_hi] (n_hi = 4*n_lo), the
    sandbox stand-in for N vs 4N executors. The host is a single shared
    32-core box: each Spark task also drives a Python worker process, so the
    pair (4, 16) keeps both runs un-oversubscribed; runs alternate between
    levels and each level takes its best of ``reps`` to suppress the host's
    memory-reclaim noise. efficiency = (T_lo / T_hi) / 4."""
    data_dir = _synthesize_shared_corpus(sf_dir, n_clips)
    runs: dict[int, list] = {n_lo: [], n_hi: []}
    try:
        for _ in range(reps):
            for cpus in (n_lo, n_hi):
                runs[cpus].append(_one_scaling_run(sf_dir, cpus, n_clips, data_dir))
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
    best = {c: min(rs, key=lambda r: r["value"]) for c, rs in runs.items()}
    t_lo, t_hi = best[n_lo]["value"], best[n_hi]["value"]
    eff = (t_lo / t_hi) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — throughput + two-parallelism scaling evidence\n\n"
            "End-to-end dedup (signatures → banding/candidates → verify →\n"
            "connected components; synthesis excluded) on the identical\n"
            f"deterministic corpus of {n_clips} clips, local[{n_lo}] vs\n"
            f"local[{n_hi}] — the sandbox stand-in for N vs 4N executors\n"
            "(BASELINE.json north_rule). Each Spark task drives a Python\n"
            "worker process, so (4, 16) keeps both runs inside the host's 32\n"
            "cores; best of "
            f"{reps} alternating runs per level (shared-host noise).\n\n"
            "| parallelism | dedup wall (s) | clips/sec |\n|---|---|---|\n"
            f"| local[{n_lo}]  | {t_lo} | {best[n_lo]['clips_per_sec']} |\n"
            f"| local[{n_hi}] | {t_hi} | {best[n_hi]['clips_per_sec']} |\n\n"
            f"**Scaling efficiency (T_{n_lo} / T_{n_hi}) / 4 = {eff:.3f}** "
            f"(target ≥ 0.8)\n\n"
            f"All runs:\n```json\n{json.dumps(runs, indent=2)}\n```\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      f"t{n_lo}": t_lo, f"t{n_hi}": t_hi}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--n-clips", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args.sf_dir, n_clips=args.n_clips or 20000, reps=args.reps)
        return

    r = bench_once(args.sf_dir, args.cpus, n_clips=args.n_clips,
                   shuffle_partitions=args.shuffle_partitions,
                   skip_queries=args.skip_queries, data_dir=args.data_dir)
    line = {
        "metric": "e2e_dedup_sec",
        "value": r["dedup_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": r["sf"],
        "clips_per_sec": r["clips_per_sec"],
        "n_clips": r["n_clips"],
        "cpus": r["cpus"],
        "synth_sec": r["synth_sec"],
        "n_clusters": r["n_clusters"],
        "stage_secs": r.get("stage_secs", {}),
        "dup_pair_recall": r.get("dup_pair_recall"),
        "dup_pair_precision": r.get("dup_pair_precision"),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
