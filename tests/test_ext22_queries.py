"""Boundary tests for queries_ext22: sliding-window reach and spine
membership."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def day(d):
    return dt.datetime(2024, 1, d, 12, 0, 0)


def test_sliding_window_reach_and_spine(spark, tmp_path):
    # Events on days 1, 5, 9. Day 5 window [−6d] covers day 1; day 9
    # covers day 5 but NOT day 1 (8 days back). Days without own events
    # (2-4, 6-8) must not appear.
    rows = [
        (1, day(1), 100, "view", 0.0, "{}"),
        (2, day(5), 200, "view", 0.0, "{}"),
        (3, day(9), 300, "view", 0.0, "{}"),
        (4, day(9), 100, "view", 0.0, "{}"),  # user 100 returns on day 9
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["sliding_7d_exact_distinct_users"]
    got = {r["day"].day: r["users_7d"] for r in fn(spark, str(tmp_path)).collect()}
    assert sorted(got) == [1, 5, 9]
    assert got[1] == 1            # just user 100
    assert got[5] == 2            # users 100 (day1) + 200 (day5)
    # day 9 window covers days 3..9 -> users 200 (day5), 300, 100
    assert got[9] == 3
