"""Structured Streaming mode tests: file-source replay, fan-out sinks,
foreachBatch MERGE-equivalent upsert, idempotent re-merge, watermark path.

Streaming results must agree with the batch pipeline over the same input
(the reference's determinism requirement, streaming contract:197-199).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.generator import BoundedRun, GeneratorConfig
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_content_errors,
    parse_content_events,
    split_valid_invalid,
)
from shortvideohybridanalyticslakehouse_spark.plans import serving, verifiers
from shortvideohybridanalyticslakehouse_spark.sources.batch import jsonl_fixture_to_raw
from shortvideohybridanalyticslakehouse_spark.streaming import jobs


@pytest.fixture(scope="module")
def run():
    return BoundedRun(GeneratorConfig(total_events=2000, events_per_second=20.0))


def write_fixture(tmpdir: str, rows: list[tuple[str]], n_files: int = 2) -> str:
    src = os.path.join(tmpdir, "events_in")
    os.makedirs(src, exist_ok=True)
    chunk = len(rows) // n_files + 1
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        with open(os.path.join(src, f"part-{i:04d}.jsonl"), "w") as f:
            f.write("\n".join(v for (v,) in part))
    return src


def test_content_stream_matches_batch(spark, run, tmp_path):
    tmpdir = str(tmp_path)
    src = write_fixture(tmpdir, run.content_events(), n_files=1)
    out = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt")

    source = jobs.read_json_file_stream(spark, src)
    queries = jobs.start_content_events_job(spark, source, out, ckpt)
    for q in queries:
        q.awaitTermination(120)

    gold_stream = spark.read.parquet(os.path.join(out, "rt_video_stats_1min"))

    # batch twin over the same rows
    raw = jsonl_fixture_to_raw(spark.createDataFrame(run.content_events(), ["value"]))
    valid, invalid = split_valid_invalid(
        annotate_content_errors(parse_content_events(raw))
    )
    gold_batch = serving.gold_1min(valid)

    cols = ["video_id", "window_start"] + list(serving.GOLD_METRICS) + [
        "watch_time_sum_ms"
    ]
    a = {tuple(r) for r in gold_stream.select(*cols).collect()}
    b = {tuple(r) for r in gold_batch.select(*cols).collect()}
    assert a == b

    ok, details = verifiers.grain_unique(gold_stream, ["video_id", "window_start"])
    assert ok, details

    # bronze + invalid fan-out landed with the right shapes
    bronze = spark.read.parquet(os.path.join(out, "bronze_raw_events"))
    bad = spark.read.parquet(os.path.join(out, "invalid_events_content"))
    assert bronze.count() == valid.count()
    assert bad.count() == invalid.count()


def test_gold_merge_idempotent_replay(spark, run, tmp_path):
    """Re-running the same input through a fresh checkpoint must not
    duplicate or alter gold rows (MERGE idempotency under replay)."""
    tmpdir = str(tmp_path)
    src = write_fixture(tmpdir, run.content_events(), n_files=1)
    out = os.path.join(tmpdir, "out")

    for attempt in range(2):
        ckpt = os.path.join(tmpdir, f"ckpt_{attempt}")
        source = jobs.read_json_file_stream(spark, src)
        queries = jobs.start_content_events_job(spark, source, out, ckpt)
        for q in queries:
            q.awaitTermination(120)

    gold = spark.read.parquet(os.path.join(out, "rt_video_stats_1min"))
    ok, details = verifiers.grain_unique(gold, ["video_id", "window_start"])
    assert ok, details


def test_cdc_stream_upsert(spark, run, tmp_path):
    tmpdir = str(tmp_path)
    src = write_fixture(tmpdir, run.cdc_records(), n_files=1)
    out = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt_cdc")

    source = jobs.read_json_file_stream(spark, src)
    queries = jobs.start_cdc_upsert_job(spark, source, out, ckpt)
    for q in queries:
        q.awaitTermination(120)

    dims = spark.read.parquet(os.path.join(out, "dim_videos"))
    assert dims.count() == len(run.videos)
    # op=u (category_u mutation) won over op=c bootstrap
    assert all(r.category.endswith("_u") for r in dims.select("category").collect())
    ok, details = verifiers.grain_unique(dims, ["video_id"])
    assert ok, details


def test_multi_batch_stream_with_watermark(spark, run, tmp_path):
    """Two micro-batches: late rows beyond the watermark may drop, bounded
    by the generator's late ratio; grain stays unique."""
    tmpdir = str(tmp_path)
    src = write_fixture(tmpdir, run.content_events(), n_files=2)
    out = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt")

    source = jobs.read_json_file_stream(spark, src, max_files_per_trigger=1)
    queries = jobs.start_content_events_job(spark, source, out, ckpt)
    for q in queries:
        q.awaitTermination(180)

    gold = spark.read.parquet(os.path.join(out, "rt_video_stats_1min"))
    ok, details = verifiers.grain_unique(gold, ["video_id", "window_start"])
    assert ok, details

    raw = jsonl_fixture_to_raw(spark.createDataFrame(run.content_events(), ["value"]))
    valid, _ = split_valid_invalid(
        annotate_content_errors(parse_content_events(raw))
    )
    n_valid = valid.select("event_id").distinct().count()
    gold_sum = gold.agg(
        F.sum(sum(F.col(m) for m in serving.GOLD_METRICS)).alias("s")
    ).first().s
    ok, details = verifiers.watermark_drop_ratio(n_valid, gold_sum, max_ratio=0.05)
    assert ok, details
