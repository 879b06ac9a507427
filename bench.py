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


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"srpr-lsh-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def bench_once(sf_dir: str, cpus: int, n_clips: "int | None" = None) -> dict:
    from srpr_lsh_spark.config import DedupConfig
    from srpr_lsh_spark.plans.pipeline import run_dedup
    from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips

    sf = _sf_of(sf_dir)
    if n_clips is None:
        n_clips = max(2000, int(sf * 200_000))  # sf0.1 → 20k clips
    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(shuffle_partitions=max(cpus * 2, 8))
    params = SynthParams(
        n_clips=n_clips, block_size=250, seed=42, min_dur_ms=300, max_dur_ms=1200
    )
    tmp = tempfile.mkdtemp(prefix="srpr_bench_")
    out: dict = {"sf": sf, "cpus": cpus, "n_clips": n_clips}
    try:
        t0 = time.time()
        clips, _ = synthesize_clips(spark, params, out_dir=f"{tmp}/data")
        out["synth_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        res = run_dedup(spark, clips, cfg, warehouse_dir=f"{tmp}/wh", resume=False)
        n_clusters = res["clusters"].select("cluster_id").distinct().count()
        dedup_sec = time.time() - t0
        out["dedup_sec"] = round(dedup_sec, 2)
        out["clips_per_sec"] = round(n_clips / dedup_sec, 1)
        out["n_clusters"] = n_clusters

        # relational queries at the driver's sf dir
        import __spark_entry__ as em

        qs = em.queries()
        out["queries"] = {}
        for name in BENCH_QUERIES:
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            out["queries"][name] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return out


def run_scaling(sf_dir: str, n_clips: int = 20000) -> None:
    """Same job at local[8] and local[32]; efficiency = (T_8/T_32)/4."""
    results = {}
    for cpus in (8, 32):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--sf-dir", sf_dir, "--cpus", str(cpus),
            "--n-clips", str(n_clips), "--json-only",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["dedup_sec"], results[32]["dedup_sec"]
    eff = (t8 / t32) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — throughput + two-parallelism scaling evidence\n\n"
            "End-to-end dedup (synthesize → signatures → banding/candidates →\n"
            "verify → connected components) on the identical deterministic\n"
            f"corpus of {n_clips} clips, local[8] vs local[32] (the sandbox\n"
            "stand-in for N vs 4N executors; BASELINE.json north_rule).\n\n"
            "| parallelism | dedup wall (s) | clips/sec |\n|---|---|---|\n"
            f"| local[8]  | {t8} | {results[8]['clips_per_sec']} |\n"
            f"| local[32] | {t32} | {results[32]['clips_per_sec']} |\n\n"
            f"**Scaling efficiency (T_8 / T_32) / 4 = {eff:.3f}** "
            f"(target ≥ 0.8)\n\n"
            f"Full records:\n```json\n{json.dumps(results, indent=2)}\n```\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "t8": t8, "t32": t32}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--n-clips", type=int, default=None)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args.sf_dir, n_clips=args.n_clips or 20000)
        return

    r = bench_once(args.sf_dir, args.cpus, n_clips=args.n_clips)
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
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
