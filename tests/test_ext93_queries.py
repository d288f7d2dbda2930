"""Planted-fixture tests for ext93: DAU decomposition, purchase cadence
quartiles, week-over-week growth."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_new_vs_returning(spark, tmp_path):
    d = dt.datetime(2026, 12, 1, 10)
    rows = [
        (1, d, 1, "view", 1.0, "{}"),                       # u1 new day1
        (2, d, 2, "view", 1.0, "{}"),                       # u2 new day1
        (3, d + dt.timedelta(days=1), 1, "click", 1.0, "{}"),  # u1 returns
        (4, d + dt.timedelta(days=1), 3, "view", 1.0, "{}"),   # u3 new day2
    ]
    _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.day: (r.active_users, r.new_users, r.returning_users)
        for r in reg["new_vs_returning_daily"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["2026-12-01"] == (2, 2, 0)
    assert got["2026-12-02"] == (2, 1, 1)


def test_purchase_cadence_quartiles(spark, tmp_path):
    """u1: 5 purchases with gaps 10, 20, 30, 40 s (band 4-7) ->
    quartiles of {10,20,30,40}: p25=10 (c=1, 4c=4>=4), p50=20, p75=30.
    u2: 2 purchases gap 100 s (band 2-3)."""
    t0 = dt.datetime(2026, 12, 5)
    rows = []
    eid = 0
    ts = t0
    rows.append((1, ts, 1, "purchase", 1.0, "{}"))
    for g in (10, 20, 30, 40):
        ts = ts + dt.timedelta(seconds=g)
        eid += 1
        rows.append((100 + eid, ts, 1, "purchase", 1.0, "{}"))
    rows.append((200, t0, 2, "purchase", 1.0, "{}"))
    rows.append((201, t0 + dt.timedelta(seconds=100), 2, "purchase", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.band: (r.n_gaps, r.p25_s, r.p50_s, r.p75_s)
        for r in reg["purchase_interval_quartiles"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["4-7"] == (4, 10, 20, 30)
    assert got["2-3"] == (1, 100, 100, 100)


def test_weekly_growth(spark, tmp_path):
    """Weeks with 10 then 15 clicks -> +50% = 500000 micro; first week
    NULL."""
    monday = dt.datetime(2026, 11, 30)  # a Monday
    rows = []
    eid = 0
    for i in range(10):
        eid += 1
        rows.append((eid, monday + dt.timedelta(hours=i), 1, "click", 1.0, "{}"))
    for i in range(15):
        eid += 1
        rows.append(
            (eid, monday + dt.timedelta(days=7, hours=i), 1, "click", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = {
        (r.event_type, r.week): (r.n, r.prev_n, r.growth_micro)
        for r in reg["weekly_event_growth"][0](spark, str(tmp_path)).collect()
    }
    assert got[("click", "2026-11-30")] == (10, None, None)
    assert got[("click", "2026-12-07")] == (15, 10, 500000)
