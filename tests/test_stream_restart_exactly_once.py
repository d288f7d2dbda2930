"""Crash-restart exactly-once: stop the content-events job mid-stream and
restart it from the same checkpoints — bronze must contain every input
exactly once (file-sink commit log) and the gold table must equal the
batch twin (idempotent foreachBatch MERGE replays the interrupted batch
without double-counting)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.generator.runner import (
    BoundedRun,
    GeneratorConfig,
)
from shortvideohybridanalyticslakehouse_spark.streaming import jobs as sjobs


def _gold_batches(queries) -> int:
    n = 0
    for q in queries:
        lp = q.lastProgress
        if not lp:
            continue
        prog = json.loads(lp.json) if hasattr(lp, "json") else lp
        if prog.get("stateOperators"):
            n = max(n, int(prog.get("batchId", -1)) + 1)
    return n


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    run = BoundedRun(GeneratorConfig(total_events=2000, events_per_second=8.0, seed=3))
    events = [v for (v,) in run.content_events()]

    def ts(line: str) -> str:
        try:
            return json.loads(line).get("event_timestamp") or ""
        except ValueError:
            return ""

    events.sort(key=ts)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    chunk = (len(events) + 9) // 10
    base_mtime = time.time() - 3600
    for i in range(0, len(events), chunk):
        fp = os.path.join(src, f"p{i//chunk:04d}.jsonl")
        with open(fp, "w") as f:
            f.write("\n".join(events[i : i + chunk]))
        # FileStreamSource orders files by MODIFICATION TIME, not name —
        # files written in one fast loop can tie (or land out of order) and
        # then minute-00 rows arrive after the watermark has passed them.
        # Strictly increasing mtimes pin arrival order = event-time order.
        os.utime(fp, (base_mtime + i, base_mtime + i))
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def start():
        return sjobs.start_content_events_job(
            spark,
            sjobs.read_json_file_stream(spark, src, max_files_per_trigger=1),
            out,
            ckpt,
            trigger={"processingTime": "0 seconds"},
        )

    queries = start()
    deadline = time.time() + 120
    while time.time() < deadline and _gold_batches(queries) < 3:
        time.sleep(1)
    assert _gold_batches(queries) >= 3, "gold never progressed before the kill"
    for q in queries:  # mid-stream stop: several files still unprocessed
        q.stop()

    # batch twin computed up front: the restart loop polls against it
    from shortvideohybridanalyticslakehouse_spark.operators.validate import (
        annotate_content_errors,
        parse_content_events,
    )
    from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
        tumbling_window_agg,
    )
    from shortvideohybridanalyticslakehouse_spark.plans import serving
    from shortvideohybridanalyticslakehouse_spark.sources.batch import (
        jsonl_fixture_to_raw,
    )

    raw = jsonl_fixture_to_raw(
        spark.createDataFrame([(v,) for v in events], ["value"])
    )
    parsed = annotate_content_errors(parse_content_events(raw))
    valid_b = parsed.filter(F.col("error_code").isNull()).dropDuplicates(["event_id"])
    n_valid_expected = valid_b.count()
    gold_batch = tumbling_window_agg(
        valid_b,
        ts_col="event_timestamp",
        key_cols=["video_id"],
        window_duration="1 minute",
        count_conditions=serving.gold_count_conditions(),
        sum_exprs={"watch_time_sum_ms": F.col("watch_time_ms")},
        with_processed_at=False,
    )
    cols = ["video_id", "window_start", "watch_time_sum_ms"]
    want = sorted(tuple(r) for r in gold_batch.select(*cols).collect())

    queries = start()  # restart from the same checkpoints
    bronze_path = os.path.join(out, "bronze_raw_events")
    gold_path = os.path.join(out, "rt_video_stats_1min")
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            got = sorted(
                tuple(r)
                for r in spark.read.parquet(gold_path).select(*cols).collect()
            )
            if got == want:
                break
        except Exception:
            pass
        time.sleep(2)
    for q in queries:
        q.stop()

    # exactly-once bronze: every valid input exactly once across the restart
    bronze = spark.read.parquet(bronze_path)
    assert bronze.count() == n_valid_expected
    assert bronze.select("event_id").distinct().count() == n_valid_expected

    # gold equals the batch twin over the same bytes (idempotent MERGE)
    gold_stream = spark.read.parquet(gold_path)
    got = sorted(tuple(r) for r in gold_stream.select(*cols).collect())
    assert got == want
