"""End-to-end acceptance run (CLI twin of the reference's acceptance
shell harness, src/scripts/run_mic38_acceptance.sh): deterministic
generator -> validate/split -> serving layers -> verifier sign-off ->
BI gate pack, printed as one JSON report.

Usage:
    python tools/acceptance.py [--events 20000] [--seed 7]
Exit code 0 iff every gate passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from shortvideohybridanalyticslakehouse_spark.generator import (
        BoundedRun,
        GeneratorConfig,
    )
    from shortvideohybridanalyticslakehouse_spark.operators.validate import (
        annotate_cdc_errors,
        annotate_content_errors,
        parse_cdc_records,
        parse_content_events,
        split_valid_invalid,
    )
    from shortvideohybridanalyticslakehouse_spark.plans import bi, serving, verifiers
    from shortvideohybridanalyticslakehouse_spark.session import get_spark
    from shortvideohybridanalyticslakehouse_spark.sources.batch import (
        jsonl_fixture_to_raw,
    )

    spark = get_spark("svh-acceptance")
    spark.sparkContext.setLogLevel("ERROR")

    run = BoundedRun(
        GeneratorConfig(
            total_events=args.events, events_per_second=50.0, seed=args.seed
        )
    )
    ev_raw = jsonl_fixture_to_raw(
        spark.createDataFrame(run.content_events(), ["value"])
    )
    cdc_raw = jsonl_fixture_to_raw(
        spark.createDataFrame(run.cdc_records(), ["value"])
    )

    valid_ev, invalid_ev = split_valid_invalid(
        annotate_content_errors(parse_content_events(ev_raw))
    )
    valid_cdc, invalid_cdc = split_valid_invalid(
        annotate_cdc_errors(parse_cdc_records(cdc_raw))
    )

    layers = serving.build_all(valid_ev, valid_cdc)
    serving.register_views(spark, layers)

    gold = layers["gold_1min"]
    checks = {
        "gold_grain_unique": verifiers.grain_unique(
            gold, ["video_id", "window_start"]
        ),
        "gold_non_negative": verifiers.non_negative(
            gold,
            ["impressions", "play_start", "play_finish", "likes", "shares", "skips"],
        ),
        "gold_no_null_required": verifiers.no_null_required(
            gold, ["video_id", "window_start"]
        ),
        "content_invalid_rate": verifiers.invalid_rate_bounded(
            valid_ev, invalid_ev, max_rate=0.20
        ),
        "cdc_invalid_rate": verifiers.invalid_rate_bounded(
            valid_cdc, invalid_cdc, max_rate=0.20
        ),
    }
    report = verifiers.signoff(checks)
    gates = bi.acceptance_gates(spark)

    # M3 action-queue flow: decision context -> suppress NO_ACTION ->
    # queue rows -> validate -> enqueue with dedupe/cooldown.
    from pyspark.sql import functions as F

    from shortvideohybridanalyticslakehouse_spark.operators.decision import (
        queue_rows,
        suppress_no_action,
        validate_queue_rows,
    )
    from shortvideohybridanalyticslakehouse_spark.operators.queue import enqueue

    latest = layers["decision_context"].select(
        "video_id",
        "window_start",
        F.col("decision_type_preview").alias("decision_type"),
    )
    actionable = suppress_no_action(latest)
    valid_rows, violations = validate_queue_rows(queue_rows(actionable))
    queue = enqueue(None, valid_rows, cooldown_minutes=60)
    bucket = F.floor(F.col("window_start").cast("long") / 3600)
    queue_gates = {
        "queue_rows_all_valid": violations.count() == 0,
        "queue_action_id_unique": queue.groupBy("action_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0,
        "queue_cooldown_respected": queue.groupBy("video_id", bucket)
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0,
    }
    gates.update(queue_gates)

    # Streaming-health gates (reference: verify_mic38_sprint1_signoff.py's
    # query-progress-movement and checkpoint-growth gates, 141-510): drive
    # the real file-source streaming job over the generated events and gate
    # on (a) every query reporting progress with input rows, (b) every
    # query committing >=1 micro-batch, (c) the checkpoint tree growing
    # over the run.
    import glob
    import tempfile

    from shortvideohybridanalyticslakehouse_spark.streaming import jobs as sjobs

    sdir = tempfile.mkdtemp(prefix="svh_accept_stream_")
    src_dir = os.path.join(sdir, "events_in")
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "part-0000.jsonl"), "w") as f:
        f.write("\n".join(v for (v,) in run.content_events()))
    out_dir = os.path.join(sdir, "out")
    ckpt_dir = os.path.join(sdir, "ckpt")

    def _tree_files(d: str) -> int:
        return len(
            [p for p in glob.glob(os.path.join(d, "**"), recursive=True)
             if os.path.isfile(p)]
        )

    ckpt_before = _tree_files(ckpt_dir)
    stream_source = sjobs.read_json_file_stream(spark, src_dir)
    stream_queries = sjobs.start_content_events_job(
        spark, stream_source, out_dir, ckpt_dir
    )
    for q in stream_queries:
        q.awaitTermination(180)
    progress_ok = all(
        sum(int(p["numInputRows"]) for p in q.recentProgress) > 0
        and len(q.recentProgress) >= 1
        for q in stream_queries
    )
    commit_files = glob.glob(os.path.join(ckpt_dir, "*", "commits", "*"))
    gates.update(
        {
            "stream_progress_movement": progress_ok,
            "stream_batches_committed": len(
                [p for p in commit_files if not p.endswith(".tmp")]
            )
            >= len(stream_queries),
            "stream_checkpoint_growth": _tree_files(ckpt_dir) > ckpt_before,
        }
    )

    # Round-4 streaming SOAK gate: drive the same job through ~20
    # micro-batches (events split into 20 time-ordered files,
    # maxFilesPerTrigger=1 under availableNow) on the RocksDB state store,
    # and gate on (a) the batch count, (b) RocksDB really providing state,
    # (c) BOUNDED state: the watermark must evict dedup state as event time
    # advances, so final state rows must sit well below cumulative input.
    from shortvideohybridanalyticslakehouse_spark.streaming import stateful

    soak_dir = tempfile.mkdtemp(prefix="svh_accept_soak_")
    soak_src = os.path.join(soak_dir, "events_in")
    os.makedirs(soak_src, exist_ok=True)
    # Dedicated soak fixture: the event-time SPAN must dwarf the 2-minute
    # watermark for eviction to be observable (at the BI pack's 50 ev/s,
    # 8000 events span ~160 s and dedup state legitimately retains almost
    # everything — the first soak run caught exactly that). 8 ev/s spreads
    # the same volume over ~17 minutes, so steady-state dedup state is the
    # ~2-minute tail, not the whole run.
    soak_run = BoundedRun(
        GeneratorConfig(
            total_events=args.events, events_per_second=8.0, seed=args.seed
        )
    )
    events = [v for (v,) in soak_run.content_events()]

    def _ts(line: str) -> str:
        try:
            return json.loads(line).get("event_timestamp") or ""
        except ValueError:
            return ""

    events.sort(key=_ts)  # time-ordered files => watermark advances per batch
    n_files = 20
    chunk = max(1, (len(events) + n_files - 1) // n_files)
    import time as _time

    base_mtime = _time.time() - 3600
    for i in range(0, len(events), chunk):
        fp = os.path.join(soak_src, f"part-{i//chunk:04d}.jsonl")
        with open(fp, "w") as f:
            f.write("\n".join(events[i : i + chunk]))
        # FileStreamSource orders by mtime, not name: pin strictly
        # increasing mtimes so arrival order = event-time order and the
        # watermark-eviction gate measures eviction, not reorder drops.
        os.utime(fp, (base_mtime + i // chunk, base_mtime + i // chunk))
    prev_state_conf = stateful.apply_rocksdb_state(spark)
    try:
        soak_queries = sjobs.start_content_events_job(
            spark,
            sjobs.read_json_file_stream(spark, soak_src, max_files_per_trigger=1),
            os.path.join(soak_dir, "out"),
            os.path.join(soak_dir, "ckpt"),
        )
        for q in soak_queries:
            q.awaitTermination(600)
    finally:
        stateful.restore_confs(spark, prev_state_conf)
    gold_prog = [
        json.loads(p.json) if hasattr(p, "json") else p
        for q in soak_queries
        for p in q.recentProgress
        if (json.loads(p.json) if hasattr(p, "json") else p).get("stateOperators")
    ]
    state_rows = [
        sum(int(so.get("numRowsTotal", 0)) for so in p["stateOperators"])
        for p in gold_prog
    ]
    removed = sum(
        int(so.get("numRowsRemoved", 0))
        for p in gold_prog
        for so in p["stateOperators"]
    )
    soak_input = sum(int(p.get("numInputRows", 0)) for p in gold_prog)
    rocksdb_seen = any(
        "rocksdb" in json.dumps(p.get("stateOperators", [])).lower()
        for p in gold_prog
    )
    gates.update(
        {
            "soak_micro_batches_ge_15": len(gold_prog) >= 15,
            "soak_rocksdb_state_provider": rocksdb_seen,
            "soak_state_evicted": removed > 0,
            "soak_state_bounded": bool(state_rows)
            and state_rows[-1] < max(1, soak_input) * 0.6,
        }
    )

    ok = bool(report["_overall"]["passed"]) and all(gates.values())
    print(
        json.dumps(
            {
                "passed": ok,
                "events": args.events,
                "seed": args.seed,
                "verifier_signoff": report,
                "bi_gates": gates,
            },
            default=str,
        )
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
