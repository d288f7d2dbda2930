"""Shuffle-bytes regression gate (VERDICT r6 #5).

Measures REAL shuffle write bytes/records (Spark SQLMetrics off the
executed plan, not estimates) for the most expensive registry queries at
a scale dir, persists them as a committed artifact, and on later runs
FAILS if any query's shuffle bytes grew >2x while the module that
registered it is unchanged — the same operationalization of the
100x-scale judgment that test_plan_invariants.py gives the
CartesianProduct/BatchEvalPython ban: a plan rework that silently doubles
the shuffled volume is a scale regression even when wall-clock at sf0.1
hides it behind CPU noise.

Usage:
    python tools/shuffle_gate.py /root/testdata/sf0.1 --record   # (re)write artifact
    python tools/shuffle_gate.py /root/testdata/sf0.1            # gate vs artifact
    python tools/shuffle_gate.py /root/testdata/sf0.1 q1 q2 ...  # explicit subset

Query selection (no explicit names): the TOP_N most expensive by median
in the newest BENCHDETAIL_r*.json, plus any query named in EXTRA (the
flagship serving path). Artifact: tools/shuffle_metrics_sf{sf}.json —
per query: shuffle bytes/records written, exchange count, broadcast
bytes (dataSize), and the sha256 of the registering module's source (the
unchanged-code predicate for gating).

Exit status: 0 = within bounds (or artifact freshly recorded),
1 = regression. Changed-module growth is reported but NOT fatal — a
deliberate rework owns its new baseline via --record.

Known limitation: queries that localCheckpoint their result (the
iterative graph family) truncate the traversable plan at the checkpoint
scan, so their exchanges report as 0 — their shuffle volume is bounded
by the fixed-round loop structure audited in PLANS.md instead. First
fruit of the gate (round 7): multimodal_mulaw_quant_error was
broadcasting a 352 MB misestimated posexplode side; the join is now a
closed-form inline column (see queries_ext62.py).
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

from pyspark.sql import DataFrame

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark

TOP_N = 20
EXTRA = ["flagship_decision_context", "rolling_30m_metrics", "events_1min_agg"]
GROWTH_BAR = 2.0
# below this, absolute byte jitter (AQE coalescing, row-group boundaries)
# dominates and a ratio is noise, not signal (env override for tests)
MIN_GATED_BYTES = int(os.environ.get("SVH_SHUFFLE_MIN_BYTES", "1000000"))


def _module_hash(fn) -> str:
    src = inspect.getsource(sys.modules[fn.__module__])
    return hashlib.sha256(src.encode()).hexdigest()[:16]


def _walk_metrics(node, acc) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "ReusedExchangeExec":
        return  # metrics mirror the original exchange — counting = double
    mets = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        mets[kv._1()] = kv._2().value()
    if cls == "ShuffleExchangeExec":
        acc["exchanges"] += 1
        acc["shuffle_bytes_written"] += int(mets.get("shuffleBytesWritten", 0))
        acc["shuffle_records_written"] += int(
            mets.get("shuffleRecordsWritten", 0)
        )
    elif cls == "BroadcastExchangeExec":
        acc["broadcasts"] += 1
        acc["broadcast_bytes"] += int(mets.get("dataSize", 0))
    if cls == "AdaptiveSparkPlanExec":
        _walk_metrics(node.executedPlan(), acc)
    elif cls.endswith("QueryStageExec"):
        _walk_metrics(node.plan(), acc)
    ch = node.children()
    for i in range(ch.length()):
        _walk_metrics(ch.apply(i), acc)


def measure(df: DataFrame) -> dict:
    df.collect()  # finalize AQE; accumulate the metrics
    acc = {
        "exchanges": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "broadcasts": 0,
        "broadcast_bytes": 0,
    }
    _walk_metrics(df._jdf.queryExecution().executedPlan(), acc)
    return acc


def pick_queries(registry) -> list[str]:
    detail = sorted(glob.glob(os.path.join(_REPO, "BENCHDETAIL_r*.json")))
    names: list[str] = []
    if detail:
        with open(detail[-1]) as f:
            medians = json.load(f).get("queries", {})
        names = [
            q
            for q, _ in sorted(
                medians.items(), key=lambda kv: -float(kv[1] or 0)
            )
            if q in registry
        ][:TOP_N]
    for q in EXTRA:
        if q in registry and q not in names:
            names.append(q)
    return names


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    record = "--record" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    artifact = os.environ.get("SVH_SHUFFLE_ARTIFACT") or os.path.join(
        _REPO, "tools", f"shuffle_metrics_sf{sf_tag}.json"
    )

    registry = load_all()
    names = args[1:] if len(args) > 1 else pick_queries(registry)
    spark = get_spark("svh-shuffle-gate")
    spark.sparkContext.setLogLevel("ERROR")

    current: dict[str, dict] = {}
    for name in names:
        fn, _oracle = registry[name]
        m = measure(fn(spark, sf_dir))
        m["module_hash"] = _module_hash(fn)
        current[name] = m
        print(
            f"{name}: exchanges={m['exchanges']} "
            f"shuffle={m['shuffle_bytes_written']:,}B "
            f"records={m['shuffle_records_written']:,} "
            f"broadcast={m['broadcast_bytes']:,}B"
        )

    if record or not os.path.exists(artifact):
        merged = {}
        if os.path.exists(artifact):
            with open(artifact) as f:
                merged = json.load(f).get("queries", {})
        merged.update(current)  # subset --record refreshes, never clobbers
        with open(artifact, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "queries": merged}, f, indent=1, sort_keys=True
            )
        print(f"RECORDED {len(current)} queries -> {artifact} ({len(merged)} total)")
        return 0

    with open(artifact) as f:
        base = json.load(f)["queries"]
    failures, notes = [], []
    for name, m in current.items():
        b = base.get(name)
        if b is None:
            notes.append(f"NEW (no baseline): {name}")
            continue
        prev = b["shuffle_bytes_written"]
        cur = m["shuffle_bytes_written"]
        if max(prev, cur) < MIN_GATED_BYTES:
            continue
        ratio = cur / prev if prev else float("inf")
        if ratio > GROWTH_BAR:
            msg = (
                f"{name}: shuffle bytes {prev:,} -> {cur:,} "
                f"({ratio:.2f}x > {GROWTH_BAR}x)"
            )
            if m["module_hash"] == b["module_hash"]:
                failures.append(msg + " with UNCHANGED module")
            else:
                notes.append(
                    msg + " but module changed — re-baseline with --record"
                )
    for s in notes:
        print("NOTE", s)
    for s in failures:
        print("FAIL", s)
    print("GATE:", "FAIL" if failures else "PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
