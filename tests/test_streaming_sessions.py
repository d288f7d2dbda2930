"""Streaming session_window (T9): closed sessions emitted in append mode
must agree exactly with the batch session_window over the same input."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.generator import (
    BoundedRun,
    GeneratorConfig,
)
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_content_errors,
    parse_content_events,
)
from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    jsonl_fixture_to_raw,
)
from shortvideohybridanalyticslakehouse_spark.streaming import jobs

# late_event_ratio=0: a 2-second watermark would DROP the generator's
# 121-210s-late events in streaming while batch (no watermark) keeps
# them — the agreement assertion needs identical effective inputs.
CFG = GeneratorConfig(
    total_events=1500, events_per_second=20.0, late_event_ratio=0.0
)
# 1500 events / 20 ev/s ≈ 75 s of event time over ~200 users => per-user
# inter-event gaps of ~10 s: a 5-second gap yields several sessions per
# user, and most close well before max_ts - watermark.
GAP = "5 seconds"
WATERMARK = "2 seconds"


@pytest.fixture(scope="module")
def run():
    return BoundedRun(CFG)


def _fixture_dir(tmpdir: str, rows) -> str:
    src = os.path.join(tmpdir, "events_in")
    os.makedirs(src, exist_ok=True)
    half = len(rows) // 2
    for i, part in enumerate((rows[:half], rows[half:])):
        with open(os.path.join(src, f"part-{i:04d}.jsonl"), "w") as f:
            f.write("\n".join(v for (v,) in part))
    return src


def _key(rows):
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.watch_time_sum_ms)
        for r in rows
    }


def test_streaming_sessions_match_batch_closed_set(spark, run, tmp_path):
    rows = run.content_events()
    src = _fixture_dir(str(tmp_path), rows)
    # one file per micro-batch so the watermark advances between batches
    # (plus the engine's no-data batch emits the final closed set)
    stream_src = jobs.read_json_file_stream(spark, src, max_files_per_trigger=1)
    q = jobs.start_session_window_job(
        spark,
        stream_src,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        gap=GAP,
        watermark=WATERMARK,
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(str(tmp_path / "out" / "user_sessions"))
    raw = jsonl_fixture_to_raw(
        spark.createDataFrame(rows, "value string"), "value"
    )
    valid = annotate_content_errors(parse_content_events(raw)).filter(
        F.col("error_code").isNull()
    )
    batch = jobs.session_window_plan(valid, gap=GAP, watermark=None)

    skey = _key(streamed.collect())
    bkey = _key(batch.collect())
    assert skey, "no sessions emitted"
    # append mode emits only watermark-closed sessions: emitted rows must
    # be row-for-row identical to the batch truth where they overlap
    assert skey <= bkey
    # and every batch session closed before the final watermark horizon
    # must have been emitted
    max_ts = valid.agg(F.max("event_timestamp")).first()[0]
    horizon = max_ts - dt.timedelta(seconds=2)
    # STRICT inequality: append mode finalizes a session only once the
    # watermark passes its end, so a session ending exactly at the horizon
    # may legitimately be unemitted — including it would flake.
    closed = {k for k in bkey if k[2] < horizon}
    assert closed, "fixture produced no closed sessions — parameters wrong"
    assert closed <= skey
