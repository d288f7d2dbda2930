"""Binned range join operator (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.rangejoin import (
    binned_interval_join,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _frames(spark):
    events = spark.createDataFrame(
        [(i, f"2024-01-01T00:{i:02d}:30") for i in range(50)],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [
            ("w1", "2024-01-01T00:05:00", "2024-01-01T00:10:00"),
            # spans multiple 300s bins
            ("w2", "2024-01-01T00:08:00", "2024-01-01T00:31:00"),
            # zero-width guard: end == start + 1s
            ("w3", "2024-01-01T00:40:30", "2024-01-01T00:40:31"),
        ],
        "wid string, s string, e string",
    ).select(
        "wid",
        F.col("s").cast("timestamp").alias("w_start"),
        F.col("e").cast("timestamp").alias("w_end"),
    )
    return events, intervals


def test_binned_join_equals_naive_range_join(spark):
    """The binned plan must produce EXACTLY the naive crossJoin+filter
    result (including events matching several overlapping intervals),
    for bin widths smaller, equal to, and larger than interval spans."""
    events, intervals = _frames(spark)
    naive = {
        (r.event_id, r.wid)
        for r in events.crossJoin(intervals)
        .where((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .collect()
    }
    assert naive  # non-trivial fixture
    for bin_s in (60, 300, 3600):
        got = {
            (r.event_id, r.wid)
            for r in binned_interval_join(
                events, "ts", intervals, "w_start", "w_end", bin_s
            ).collect()
        }
        assert got == naive, bin_s


def test_binned_join_boundary_half_open(spark):
    """ts == start matches; ts == end does not ([start, end))."""
    events = spark.createDataFrame(
        [(1, "2024-01-01T00:05:00"), (2, "2024-01-01T00:10:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [("w", "2024-01-01T00:05:00", "2024-01-01T00:10:00")],
        "wid string, s string, e string",
    ).select(
        "wid",
        F.col("s").cast("timestamp").alias("w_start"),
        F.col("e").cast("timestamp").alias("w_end"),
    )
    got = binned_interval_join(
        events, "ts", intervals, "w_start", "w_end", 300
    ).collect()
    assert [r.event_id for r in got] == [1]


def test_high_traffic_registry_shape(spark):
    fn, _ = REGISTRY["high_traffic_window_rollup"]
    rows = fn(spark, SF).collect()
    for r in rows:
        assert r.window_seconds >= 60 and r.window_seconds % 60 == 0
        assert r.n_events >= r.n_users >= 1


def test_binned_join_stream_static(spark, tmp_path):
    """Stream-static twin: the binned interval join is an equi join on
    _bin, so it composes with Structured Streaming (stream events x
    static windows) with no stateful operator — each micro-batch's
    output must equal the batch join over the same rows."""
    import os

    events, intervals = _frames(spark)
    src = os.path.join(str(tmp_path), "ev_in")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    joined = binned_interval_join(
        stream, "ts", intervals, "w_start", "w_end", 300
    ).select("event_id", "wid")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.event_id, r.wid) for r in spark.read.parquet(out).collect()}
    expected = {
        (r.event_id, r.wid)
        for r in binned_interval_join(
            events, "ts", intervals, "w_start", "w_end", 300
        ).collect()
    }
    assert got == expected and got


def test_binned_join_property_random_intervals(spark):
    """Property: for arbitrary events and arbitrary (possibly
    overlapping, possibly degenerate) intervals, the binned join equals
    the naive crossJoin+filter at any bin width."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        ev=st.lists(
            st.integers(min_value=0, max_value=7200), min_size=1, max_size=30
        ),
        iv=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7200),
                st.integers(min_value=1, max_value=3600),
            ),
            min_size=1,
            max_size=8,
        ),
        bin_s=st.sampled_from([60, 300, 977, 3600]),
    )
    def check(ev, iv, bin_s):
        events = spark.createDataFrame(
            [(i, 1_700_000_000 + s) for i, s in enumerate(ev)],
            "event_id long, epoch long",
        ).select("event_id", F.col("epoch").cast("timestamp").alias("ts"))
        intervals = spark.createDataFrame(
            [
                (i, 1_700_000_000 + s, 1_700_000_000 + s + span)
                for i, (s, span) in enumerate(iv)
            ],
            "wid long, s long, e long",
        ).select(
            "wid",
            F.col("s").cast("timestamp").alias("w_start"),
            F.col("e").cast("timestamp").alias("w_end"),
        )
        naive = {
            (r.event_id, r.wid)
            for r in events.crossJoin(intervals)
            .where(
                (F.col("ts") >= F.col("w_start"))
                & (F.col("ts") < F.col("w_end"))
            )
            .collect()
        }
        got = {
            (r.event_id, r.wid)
            for r in binned_interval_join(
                events, "ts", intervals, "w_start", "w_end", bin_s
            ).collect()
        }
        assert got == naive

    check()
