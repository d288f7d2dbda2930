"""Expected steps to absorption (ext128): hand-solved fundamental-
matrix values on the ext122 planted chain."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_expected_steps_planted_chain(spark, tmp_path):
    """Same chain as test_ext122: start -> {click 1/2, view 1/4,
    conv 1/4}; click -> {conv 1/2, view 1/2}; view -> {conv 1/2,
    null 1/2}. Hand-solved: h(view) = 1, h(click) = 1.5, h(start) = 2;
    unreached channels absorb in one step (null-row fallback)."""
    t0 = dt.datetime(2026, 6, 1, 9, 0, 0)

    def ev(eid, user, etype, minutes):
        return (
            eid,
            t0 + dt.timedelta(minutes=minutes),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 1, "click", 0),
        ev(2, 1, "purchase", 10),
        ev(3, 2, "click", 0),
        ev(4, 2, "view", 5),
        ev(5, 2, "purchase", 10),
        ev(6, 3, "view", 0),
        ev(7, 4, "purchase", 0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = {
        r.state: r.expected_steps
        for r in reg["markov_expected_steps"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "start": 2.0,
        "click": 1.5,
        "view": 1.0,
        "error": 1.0,
        "signup": 1.0,
    }
