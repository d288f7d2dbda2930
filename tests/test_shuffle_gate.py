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


def test_max_broadcast_tracked_and_hint_survives_threshold_off(spark):
    """The cap discriminator's premise: with the auto-broadcast
    threshold off, an explicit F.broadcast hint still plans a
    BroadcastExchange while an unhinted equi-join does not."""
    fact = spark.range(0, 50_000).select((F.col("id") % 100).alias("k"), "id")
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("v").alias("v")
    )
    m = measure(fact.join(F.broadcast(dim), "k"))
    assert m["max_broadcast_bytes"] > 0
    assert m["max_broadcast_bytes"] <= m["broadcast_bytes"]

    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(key, "-1")
    try:
        hinted = measure(fact.join(F.broadcast(dim), "k"))
        assert hinted["broadcasts"] >= 1  # the hint survives
        plain = measure(fact.join(dim, "k"))
        assert plain["broadcasts"] == 0  # AQE's choice is gone
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _run_gate_cap(artifact, cap, *args):
    env = dict(
        os.environ,
        SVH_SHUFFLE_ARTIFACT=artifact,
        SVH_SHUFFLE_MIN_BYTES="1000",
        SVH_BROADCAST_CAP_BYTES=str(cap),
    )
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "shuffle_gate.py"),
         SF_DIR, *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_cap_fails_hinted_but_passes_aqe_broadcasts(tmp_path):
    """With a 1000-byte cap every broadcast is a suspect.
    join_enrich_revenue (explicit F.broadcast dim hints) must HARD-FAIL;
    TPC-H Q4 (no hints — its big broadcast is AQE's runtime choice) must
    pass with an 'AQE-chosen' note. (The flagship itself is unusable
    here: finalize_bounded collapses it to a LocalTableScan with no
    walkable metrics.)"""
    artifact = os.path.join(str(tmp_path), "m.json")
    bad = _run_gate_cap(artifact, 1000, "--record", "join_enrich_revenue")
    assert bad.returncode == 1, bad.stdout + bad.stderr
    assert "HINTED broadcast" in bad.stdout and "GATE: FAIL" in bad.stdout

    ok = _run_gate_cap(artifact, 1000, "--record", "tpch_q4_order_priority")
    assert ok.returncode == 0, ok.stdout + ok.stderr
    assert "AQE-chosen" in ok.stdout and "GATE: PASS" in ok.stdout
