"""Custom Python data source: distributed deterministic event generation."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.sources import pydatasource


def _read(spark, **opts):
    pydatasource.register(spark)
    reader = spark.read.format("svh_synth_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_schema_and_rowcount(spark):
    df = _read(spark, n_rows=1000, seed=7, n_partitions=4)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    assert df.count() == 1000
    assert df.select("event_id").distinct().count() == 1000


def test_partition_invariance(spark):
    """Same (n_rows, seed) must yield the identical dataset under ANY
    partitioning — the per-row purity contract."""
    a = _read(spark, n_rows=500, seed=11, n_partitions=1).collect()
    b = _read(spark, n_rows=500, seed=11, n_partitions=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_seed_changes_data(spark):
    a = _read(spark, n_rows=200, seed=1).collect()
    b = _read(spark, n_rows=200, seed=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, b))


def test_composes_with_engine_plans(spark):
    """The source is a normal relation: aggregations, filters, joins work."""
    df = _read(spark, n_rows=2000, seed=42, n_partitions=8)
    agg = (
        df.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("spend"))
    )
    rows = agg.orderBy(F.col("spend").desc()).limit(5).collect()
    assert rows and all(r.spend > 0 for r in rows)


def test_streaming_reader_deterministic_batches(spark, tmp_path):
    """The streaming twin drains the same deterministic sequence in
    rows_per_batch micro-batches; the union of batches equals the batch
    read of the same (seed, n) range."""
    import os

    pydatasource.register(spark)
    stream = (
        spark.readStream.format("svh_synth_events")
        .option("seed", 5)
        .option("rows_per_batch", 100)
        .option("max_rows", 600)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # drain: the bounded source stops yielding rows at max_rows
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("select count(*) c from synth_stream").first()["c"] >= 600:
            break
        time.sleep(1)
    q.stop()
    got = sorted(map(tuple, spark.sql("select * from synth_stream").collect()))
    want = sorted(
        map(
            tuple,
            _read(spark, n_rows=600, seed=5, n_partitions=3).collect(),
        )
    )
    assert got == want
    # multiple micro-batches actually ran
    import json

    progs = [json.loads(p.json) for p in q.recentProgress]
    assert sum(1 for p in progs if p.get("numInputRows", 0) > 0) >= 3


def test_content_events_job_on_custom_source(spark, tmp_path):
    """The engine's full parse -> validate -> dedup -> 1-min gold pipeline
    runs unchanged on the custom Python streaming source, and its gold
    table matches the batch twin computed from the SAME deterministic
    rows — source-agnosticism, end to end."""
    import os

    from shortvideohybridanalyticslakehouse_spark.streaming import jobs as sjobs

    pydatasource.register(spark)
    stream = (
        spark.readStream.format("svh_synth_content_events")
        .option("seed", 9)
        .option("rows_per_batch", 400)
        .option("max_rows", 1200)
        .load()
    )
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    queries = sjobs.start_content_events_job(
        spark,
        pydatasource.as_raw_stream(stream),
        out,
        ckpt,
        trigger={"processingTime": "0 seconds"},
    )
    import json as _json
    import time

    # drain: every query reports its source offset at max_rows with no
    # further input
    deadline = time.time() + 180
    while time.time() < deadline:
        done = 0
        for q in queries:
            lp = q.lastProgress
            if not lp:
                continue
            prog = _json.loads(lp.json) if hasattr(lp, "json") else lp
            src = (prog.get("sources") or [{}])[0]
            end = src.get("endOffset")
            if isinstance(end, str):
                try:
                    end = _json.loads(end)
                except ValueError:
                    end = {}
            if (end or {}).get("index") == 1200 and prog.get("numInputRows") == 0:
                done += 1
        if done == len(queries):
            break
        time.sleep(2)
    for q in queries:
        q.stop()
    bronze_path = os.path.join(out, "bronze_raw_events")
    bronze = spark.read.parquet(bronze_path)
    assert bronze.count() == 1200  # all synth rows are valid; none dropped

    # batch twin: identical rows through the batch validate + gold agg
    from shortvideohybridanalyticslakehouse_spark.operators.validate import (
        annotate_content_errors,
        parse_content_events,
    )
    from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
        tumbling_window_agg,
    )
    from shortvideohybridanalyticslakehouse_spark.plans import serving
    from pyspark.sql import functions as F

    batch_raw = pydatasource.as_raw_stream(
        spark.read.format("svh_synth_content_events")
        .option("seed", 9)
        .option("n_rows", 1200)
        .load()
    )
    parsed = annotate_content_errors(parse_content_events(batch_raw))
    valid = parsed.filter(F.col("error_code").isNull())
    gold_batch = tumbling_window_agg(
        valid,
        ts_col="event_timestamp",
        key_cols=["video_id"],
        window_duration="1 minute",
        count_conditions=serving.gold_count_conditions(),
        sum_exprs={"watch_time_sum_ms": F.col("watch_time_ms")},
        with_processed_at=False,
    )
    gold_stream = spark.read.parquet(os.path.join(out, "rt_video_stats_1min"))
    cols = ["video_id", "window_start", "watch_time_sum_ms"]
    got = sorted(tuple(r) for r in gold_stream.select(*cols).collect())
    want = sorted(tuple(r) for r in gold_batch.select(*cols).collect())
    assert got == want
