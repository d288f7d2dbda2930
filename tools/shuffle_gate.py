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
    python tools/shuffle_gate.py /root/testdata/sf0.1 --all      # FULL registry

Broadcast-size audit (VERDICT r7 #1): every run also records the largest
single BroadcastExchange dataSize per query (max_broadcast_bytes). A
query whose largest broadcast exceeds BROADCAST_CAP (default 32 MB at
sf0.1; env SVH_BROADCAST_CAP_BYTES) is re-run once with
autoBroadcastJoinThreshold=-1 — the conf kills every AQE-CHOSEN
broadcast but leaves explicit F.broadcast hints intact, so a broadcast
that survives is hint-forced on a frame that grows with the data: the
mulaw failure family (352 MB misestimated broadcast, caught r7). Those
HARD-FAIL, record mode included, module changed or not. AQE-chosen
big broadcasts are merely noted: AQE re-decides per run, so at a 100x
catalog it degrades to a shuffle join on its own. The top-20 tracking
missed the recsys lanes; --all closes that blind spot.

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
# hard cap on any single BroadcastExchange dataSize — only an explicit
# F.broadcast hint can exceed AQE's auto threshold, and a hinted frame
# this big at sf0.1 is a driver OOM at 100x (VERDICT r7 #1)
BROADCAST_CAP = int(
    os.environ.get("SVH_BROADCAST_CAP_BYTES", str(32 * 1024 * 1024))
)
# Broadcast allow-list gate (VERDICT r9 #1): round 9's 10x probe proved
# AQE only PROMOTES sort-merge -> broadcast, never the reverse — a
# statically-misestimated build side (post-explode/post-agg frames whose
# stats Catalyst gets wrong) keeps broadcasting as it grows (bigram:
# 419 MB at 10x). So any single broadcast above the watch threshold must
# be consciously owned: the query either carries a shuffle_hash pin (its
# broadcast then drops below watch) or appears here with the reason its
# build side is provably bounded / estimator-visible. Estimator-visible
# means the size estimate is rooted in the parquet scan footprint, so at
# a larger SF Catalyst statically plans SMJ from the start — the class
# that genuinely adapts, unlike the post-explode misestimate class.
BROADCAST_WATCH = int(
    os.environ.get("SVH_BROADCAST_WATCH_BYTES", str(12 * 1024 * 1024))
)
BOUNDED_BUILD_ALLOWLIST: dict[str, str] = {
    "tpch_q4_order_priority": (
        "orders-scan build side: estimator-visible (scan-rooted size), "
        "statically demotes to SMJ at larger SF"
    ),
    "tpch_q5_local_supplier_volume": (
        "orders/customer scan-rooted build sides: estimator-visible, "
        "statically demotes to SMJ at larger SF"
    ),
    "tpch_q7_volume_shipping": (
        "orders scan-rooted build side: estimator-visible, statically "
        "demotes to SMJ at larger SF"
    ),
    "dsir_importance_topk": (
        "hashed-vocab count frame: 100x probe (tools/scale_probe_round8c"
        ".py, PLANS.md round 9) measured AQE demoting it to SMJ — 0 MB "
        "broadcast at 100x"
    ),
    "dsir_source_selection_rates": (
        "same DSIR vocab frame as dsir_importance_topk; covered by the "
        "same 100x probe row"
    ),
    "tukey_outlier_rate": (
        "build side is the per-event_type quartile frame over the "
        "closed alphabet (5 rows) — the 12.58 MB dataSize is the "
        "HashedRelation PAGE ALLOCATION floor, not data, and sits 16 "
        "bytes under the watch; declared so a re-measure cannot flap "
        "the gate"
    ),
}


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
        size = int(mets.get("dataSize", 0))
        acc["broadcast_bytes"] += size
        acc["max_broadcast_bytes"] = max(acc["max_broadcast_bytes"], size)
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
        "max_broadcast_bytes": 0,
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
    run_all = "--all" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    artifact = os.environ.get("SVH_SHUFFLE_ARTIFACT") or os.path.join(
        _REPO, "tools", f"shuffle_metrics_sf{sf_tag}.json"
    )

    registry = load_all()
    if run_all:
        names = list(registry)
    else:
        names = args[1:] if len(args) > 1 else pick_queries(registry)
    spark = get_spark("svh-shuffle-gate")
    spark.sparkContext.setLogLevel("ERROR")

    current: dict[str, dict] = {}
    cap_suspects: list[str] = []
    for name in names:
        fn, _oracle = registry[name]
        m = measure(fn(spark, sf_dir))
        m["module_hash"] = _module_hash(fn)
        current[name] = m
        print(
            f"{name}: exchanges={m['exchanges']} "
            f"shuffle={m['shuffle_bytes_written']:,}B "
            f"records={m['shuffle_records_written']:,} "
            f"broadcast={m['broadcast_bytes']:,}B "
            f"maxbcast={m['max_broadcast_bytes']:,}B"
        )
        if m["max_broadcast_bytes"] > BROADCAST_CAP:
            cap_suspects.append(name)

    # Discriminate hint-forced from AQE-chosen: with the auto threshold
    # off, the only BroadcastExchanges left come from explicit hints.
    cap_failures: list[str] = []
    cap_notes: list[str] = []
    if cap_suspects:
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ):
            spark.conf.set(key, "-1")
        for name in cap_suspects:
            fn, _oracle = registry[name]
            m2 = measure(fn(spark, sf_dir))
            sz = m2["max_broadcast_bytes"]
            if sz > BROADCAST_CAP:
                cap_failures.append(
                    f"{name}: HINTED broadcast {sz:,}B > cap "
                    f"{BROADCAST_CAP:,}B even with auto-broadcast off — "
                    f"an O(data) frame is F.broadcast-forced (the mulaw "
                    f"failure family)"
                )
            else:
                cap_notes.append(
                    f"{name}: {current[name]['max_broadcast_bytes']:,}B "
                    f"broadcast is AQE-chosen (hint-only size {sz:,}B) — "
                    f"adapts away at scale"
                )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    for s in cap_notes:
        print("NOTE", s)

    # Allow-list sweep (VERDICT r9 #1): every over-watch broadcast — in
    # this run's measurements AND in the committed artifact's rows for
    # queries not re-measured here — must be declared bounded/adaptive.
    def _watch_failures(rows: dict[str, dict]) -> list[str]:
        out = []
        for qname, qm in sorted(rows.items()):
            sz = qm.get("max_broadcast_bytes", 0)
            if sz > BROADCAST_WATCH and qname not in BOUNDED_BUILD_ALLOWLIST:
                out.append(
                    f"{qname}: broadcast {sz:,}B > watch "
                    f"{BROADCAST_WATCH:,}B and NOT in "
                    f"BOUNDED_BUILD_ALLOWLIST — pin shuffle_hash on the "
                    f"growing build side, or add a justified allow-list "
                    f"entry (AQE never demotes a misestimated broadcast; "
                    f"round-9 probe)"
                )
        return out

    stale = {}
    if os.path.exists(artifact):
        with open(artifact) as f:
            stale = {
                k: v
                for k, v in json.load(f).get("queries", {}).items()
                if k not in current and k in registry
            }
    watch_failures = _watch_failures(current) + _watch_failures(stale)
    for qname in BOUNDED_BUILD_ALLOWLIST:
        if qname not in registry:
            print(f"NOTE allow-list entry {qname} no longer registered")
    for s in watch_failures:
        print("FAIL", s)
    cap_failures.extend(watch_failures)

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
        for s in cap_failures:
            print("FAIL", s)
        print("GATE:", "FAIL" if cap_failures else "PASS")
        return 1 if cap_failures else 0

    with open(artifact) as f:
        base = json.load(f)["queries"]
    failures, notes = list(cap_failures), []
    for name, m in current.items():
        b = base.get(name)
        if b is None:
            notes.append(f"NEW (no baseline): {name}")
            continue
        checks = [
            ("shuffle bytes", b["shuffle_bytes_written"],
             m["shuffle_bytes_written"]),
            ("broadcast bytes", b.get("max_broadcast_bytes", 0),
             m["max_broadcast_bytes"]),
        ]
        for label, prev, cur in checks:
            if max(prev, cur) < MIN_GATED_BYTES:
                continue
            if prev == 0:
                notes.append(
                    f"{name}: no {label} baseline (pre-audit artifact) — "
                    f"current {cur:,}B; refresh with --record"
                )
                continue
            ratio = cur / prev
            if ratio > GROWTH_BAR:
                msg = (
                    f"{name}: {label} {prev:,} -> {cur:,} "
                    f"({ratio:.2f}x > {GROWTH_BAR}x)"
                )
                if m["module_hash"] == b["module_hash"]:
                    failures.append(msg + " with UNCHANGED module")
                else:
                    notes.append(
                        msg
                        + " but module changed — re-baseline with --record"
                    )
    for s in notes:
        print("NOTE", s)
    for s in failures:
        print("FAIL", s)
    print("GATE:", "FAIL" if failures else "PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
