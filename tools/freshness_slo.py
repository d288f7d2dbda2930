"""Streaming-flagship freshness SLO gate (VERDICT r7 #3, CLI twin of
tests/test_stream_flagship_freshness.py at adjustable volume).

Runs the FULL serving path as one streaming query over generated
event files (validate -> 1-min gold -> 30-min rolling -> thresholds ->
decision), measures event->decision latency per micro-batch with REAL
arrival times (file modification times), and prints one JSON gate
report. Exit 0 iff

  * worst per-batch P95 latency < 180 s (the reference's 3-minute
    freshness budget, reconciliation-and-slo.md), and
  * streamed decisions == the batch twin on the drained set
    (column-for-column minus wall-clock stamps).

Usage: python tools/freshness_slo.py [--events 8000] [--files 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from shortvideohybridanalyticslakehouse_spark.generator import (
        BoundedRun,
        GeneratorConfig,
    )
    from shortvideohybridanalyticslakehouse_spark.operators.validate import (
        annotate_cdc_errors,
        parse_cdc_records,
    )
    from shortvideohybridanalyticslakehouse_spark.plans import serving
    from shortvideohybridanalyticslakehouse_spark.session import get_spark
    from shortvideohybridanalyticslakehouse_spark.sources.batch import (
        jsonl_fixture_to_raw,
    )
    from shortvideohybridanalyticslakehouse_spark.streaming import flagship

    spark = get_spark("svh-freshness-slo")
    spark.sparkContext.setLogLevel("ERROR")

    run = BoundedRun(
        GeneratorConfig(
            total_events=args.events,
            events_per_second=50.0,
            seed=args.seed,
            late_event_ratio=0.0,  # strict equality: watermark drops nothing
        )
    )
    tmpdir = tempfile.mkdtemp(prefix="svh_freshness_")
    try:
        src = os.path.join(tmpdir, "events_in")
        os.makedirs(src)
        rows = run.content_events()
        chunk = len(rows) // args.files + 1
        # backdate just enough for strictly increasing mtimes — the
        # stamps ARE the measured arrival times, so a large backdate
        # would inflate the latency numbers artificially
        t0 = time.time() - args.files - 1
        for i in range(args.files):
            part = rows[i * chunk : (i + 1) * chunk]
            p = os.path.join(src, f"part-{i:04d}.jsonl")
            with open(p, "w") as f:
                f.write("\n".join(v for (v,) in part))
            os.utime(p, (t0 + i, t0 + i))  # pin arrival order

        cdc = parse_cdc_records(
            jsonl_fixture_to_raw(
                spark.createDataFrame(run.cdc_records(), ["value"])
            )
        )
        dims = serving.dim_videos(
            annotate_cdc_errors(cdc).filter(F.col("error_code").isNull())
        )
        thresholds = spark.createDataFrame(
            [(0.5, 10.0)], "velocity_p90 double, impressions_p40 double"
        )

        out = os.path.join(tmpdir, "out")
        q = flagship.start_flagship_stream(
            spark,
            flagship.read_flagship_file_stream(
                spark, src, max_files_per_trigger=1
            ),
            dims,
            thresholds,
            out,
            os.path.join(tmpdir, "ckpt"),
        )
        q.awaitTermination(600)

        report = flagship.freshness_report(out)

        streamed = flagship.read_decisions(spark, out)
        batch = flagship.flagship_batch_twin(
            flagship.valid_events_batch(spark, src), dims, thresholds
        )
        clock = {"processed_at", "max_processed_at_30m"}
        cols = sorted(set(streamed.columns) - clock)
        s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
        b_rows = sorted(map(tuple, batch.select(*cols).collect()))
        equality = s_rows == b_rows and len(s_rows) > 0

        report.update(
            {
                "stream_eq_batch": equality,
                "n_decisions": len(s_rows),
                "events": args.events,
                "files": args.files,
            }
        )
        report["pass"] = bool(report["pass"] and equality)
        print(json.dumps(report))
        flagship.drop_stores(spark, out)
        return 0 if report["pass"] else 1
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
