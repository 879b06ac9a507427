"""The spark-submit --py-files deployment path (north_rule), end to end.

Drives ``tools/dedup_job.py`` through REAL ``spark-submit`` — a separate
launcher-owned JVM, the package shipped as a ``--py-files`` zip — on a tiny
synthesized corpus, then reruns the identical command to prove
checkpoint-resume across PROCESS boundaries (a genuinely new driver JVM, not
an in-session rerun like tests/test_pipeline.py's resume tests)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "tools", "dedup_job.py")


def _spark_submit() -> "str | None":
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def _run_job(cmd, env, cwd=None):
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                       env=env, cwd=cwd)
    assert r.returncode == 0, f"job failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    # the JSON contract line is the last stdout line that parses
    line = next(
        ln for ln in reversed(r.stdout.strip().splitlines())
        if ln.startswith("{")
    )
    return json.loads(line)


def test_spark_submit_job_runs_and_resumes(spark, tmp_path):
    sub = _spark_submit()
    if sub is None:
        pytest.skip("spark-submit launcher not present")

    from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips

    clips, oracle = synthesize_clips(
        spark,
        SynthParams(n_clips=300, block_size=60, seed=7,
                    min_dur_ms=200, max_dur_ms=500),
        out_dir=str(tmp_path / "data"),
    )
    n_oracle = oracle.select("cluster_id").distinct().count()
    input_dir = clips.inputFiles()[0].rsplit("/", 1)[0].replace("file:", "")

    zip_path = str(tmp_path / "srpr_lsh_spark.zip")
    mk = subprocess.run(
        [sys.executable, JOB, "--make-pyfiles-zip", zip_path],
        capture_output=True, text=True, timeout=60,
    )
    assert mk.returncode == 0 and os.path.exists(zip_path)

    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    wh = str(tmp_path / "wh")
    cmd = [
        sub, "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=4g",
        "--py-files", zip_path,
        JOB, "--input", input_dir, "--warehouse", wh,
    ]
    # run from a NEUTRAL cwd: the package must come from the --py-files zip
    # (or the job's explicit fallback), never from an implicit repo cwd
    out1 = _run_job(cmd + ["--output", str(tmp_path / "out1")], env,
                    cwd=str(tmp_path))
    assert out1["n_clusters"] > 0
    assert out1["stages_resumed"] == []
    assert set(out1["stage_secs"]) == {
        "signatures", "candidates", "verified_pairs", "clusters"
    }
    # the pipeline must merge SOME clips (planted dup groups exist) without
    # collapsing everything; exact equality to the oracle is pinned by the
    # dedicated quality tests, not this deployment smoke
    assert 1 < out1["n_clusters"] < 300
    assert n_oracle < 300

    # identical rerun in a FRESH driver JVM: every stage restored from the
    # warehouse, identical clustering
    out2 = _run_job(cmd + ["--output", str(tmp_path / "out2")], env,
                    cwd=str(tmp_path))
    assert set(out2["stages_resumed"]) == {
        "signatures", "candidates", "verified_pairs", "clusters"
    }
    assert out2["n_clusters"] == out1["n_clusters"]

    a = spark.read.parquet(str(tmp_path / "out1")).orderBy("clip_id").collect()
    b = spark.read.parquet(str(tmp_path / "out2")).orderBy("clip_id").collect()
    assert a == b
