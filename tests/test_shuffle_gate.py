"""The shuffle-bytes regression gate must (a) measure real shuffle
metrics off the executed plan, (b) pass against its own baseline, and
(c) fail loudly when a query's shuffle grows >2x with an unchanged
module — tested by editing the artifact, not the code."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from tools.shuffle_gate import measure

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_measure_counts_real_exchanges(spark):
    df = (
        spark.range(0, 100_000)
        .groupBy((F.col("id") % 500).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    m = measure(df)
    assert m["exchanges"] >= 1
    assert m["shuffle_bytes_written"] > 0
    assert m["shuffle_records_written"] > 0
    # broadcast side of a broadcast join is counted separately
    dim = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    j = measure(df.join(F.broadcast(dim), "k"))
    assert j["broadcasts"] >= 1 and j["broadcast_bytes"] > 0


def _run_gate(artifact, *args):
    env = dict(
        os.environ,
        SVH_SHUFFLE_ARTIFACT=artifact,
        SVH_SHUFFLE_MIN_BYTES="1000",  # sf0.001 volumes sit under the prod floor
    )
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "shuffle_gate.py"), SF_DIR, *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_gate_pass_then_fail_on_tampered_baseline(tmp_path):
    artifact = os.path.join(str(tmp_path), "metrics.json")
    q = "events_1min_agg"
    rec = _run_gate(artifact, "--record", q)
    assert rec.returncode == 0, rec.stdout + rec.stderr
    ok = _run_gate(artifact, q)
    assert ok.returncode == 0 and "GATE: PASS" in ok.stdout

    with open(artifact) as f:
        data = json.load(f)
    entry = data["queries"][q]
    assert entry["shuffle_bytes_written"] > 0
    # shrink the baseline below current/2 AND above the noise floor so the
    # unchanged-module regression path must trip
    entry["shuffle_bytes_written"] = max(
        entry["shuffle_bytes_written"] // 3, 1
    )
    with open(artifact, "w") as f:
        json.dump(data, f)
    bad = _run_gate(artifact, q)
    assert bad.returncode == 1, bad.stdout + bad.stderr
    assert "GATE: FAIL" in bad.stdout and "UNCHANGED module" in bad.stdout
