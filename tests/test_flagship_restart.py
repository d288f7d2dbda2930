"""Crash-restart convergence for the streaming flagship's MOR stores:
stop the pipeline mid-stream, restart from the same checkpoint, and the
decision store must equal the batch twin with exactly one row per
(video, window) — replayed batches may append duplicate FILES, but the
merge-on-read resolution makes the VALUE idempotent, which is the
store's correctness contract."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.generator import (
    BoundedRun,
    GeneratorConfig,
)
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_cdc_errors,
    parse_cdc_records,
)
from shortvideohybridanalyticslakehouse_spark.plans import serving, verifiers
from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    jsonl_fixture_to_raw,
)
from shortvideohybridanalyticslakehouse_spark.streaming import flagship

_CLOCK = {"processed_at", "max_processed_at_30m"}


def test_flagship_restart_converges(spark, tmp_path):
    run = BoundedRun(
        GeneratorConfig(
            total_events=1200, events_per_second=20.0, late_event_ratio=0.0
        )
    )
    rows = run.content_events()
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    n_files = 4
    chunk = len(rows) // n_files + 1
    t0 = time.time() - n_files - 1
    for i in range(n_files):
        p = os.path.join(src, f"part-{i:04d}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(v for (v,) in rows[i * chunk : (i + 1) * chunk]))
        os.utime(p, (t0 + i, t0 + i))

    cdc = parse_cdc_records(
        jsonl_fixture_to_raw(spark.createDataFrame(run.cdc_records(), ["value"]))
    )
    dims = serving.dim_videos(
        annotate_cdc_errors(cdc).filter(F.col("error_code").isNull())
    )
    thresholds = spark.createDataFrame(
        [(0.5, 10.0)], "velocity_p90 double, impressions_p40 double"
    )
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def start():
        return flagship.start_flagship_stream(
            spark,
            flagship.read_flagship_file_stream(
                spark, src, max_files_per_trigger=1
            ),
            dims,
            thresholds,
            out,
            ckpt,
            trigger={"processingTime": "1 second"},
            compact_every=2,
        )

    q = start()
    # crash mid-stream: wait for at least one committed batch, then stop
    deadline = time.time() + 120
    while time.time() < deadline:
        lp = q.lastProgress
        if lp and int(lp.get("batchId", -1)) >= 1:
            break
        time.sleep(0.5)
    q.stop()
    gold_tbl, _ = flagship._store_tables(out)
    assert spark.catalog.tableExists(gold_tbl)  # the crash wasn't a no-op

    q = start()  # restart from the same checkpoint
    # drain: wait until the decision store stabilizes at the batch twin
    batch = flagship.flagship_batch_twin(
        flagship.valid_events_batch(spark, src), dims, thresholds
    )
    cols = sorted(set(batch.columns) - _CLOCK)
    want = sorted(map(tuple, batch.select(*cols).collect()))
    deadline = time.time() + 180
    got = None
    while time.time() < deadline:
        try:
            got = sorted(
                map(
                    tuple,
                    flagship.read_decisions(spark, out).select(*cols).collect(),
                )
            )
        except Exception:
            got = None
        if got == want:
            break
        time.sleep(2)
    q.stop()
    assert got == want and len(want) > 0

    streamed = flagship.read_decisions(spark, out)
    ok, details = verifiers.grain_unique(streamed, ["video_id", "window_start"])
    assert ok, details
    flagship.drop_stores(spark, out)
