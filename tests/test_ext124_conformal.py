"""Split conformal intervals (ext124): exact order-statistic q_hat on a
hand-built calibration set, plus the coverage guarantee on real data."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_conformal_hand_built_splits(spark, tmp_path):
    """Days 0..8 -> train d<=4, cal d in (4,6], eval d>6; all events in
    hour 10 of one type. Train mean = 10.00 exactly; cal residuals are
    1..9 cents so k = ceil(10*0.9) = 9 -> q_hat = 9; eval residuals
    5, 20, 5, 9 -> coverage 3/4."""
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    rows = []
    eid = 0

    def ev(day, value):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, t0 + dt.timedelta(days=day), 1, "view", value, "{}")
        )

    # train: mean exactly 10.00
    for day, v in ((0, 9.00), (1, 10.00), (2, 11.00)):
        ev(day, v)
    # calibration days 5-6: residuals 1..9 cents
    for i in range(1, 10):
        ev(5 if i % 2 else 6, 10.00 + i / 100.0)
    # eval days 7-8: residuals 5, 20, 5, 9
    for day, v in ((7, 10.05), (7, 10.20), (8, 9.95), (8, 10.09)):
        ev(day, v)

    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = reg["conformal_interval_coverage"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_train, r.n_cal, r.n_eval) == (3, 9, 4)
    assert r.q_hat_cents == 9
    assert r.coverage_micro == 750000


def test_conformal_guarantee_on_fixture_corpus(spark):
    """On the iid synthetic events the measured eval coverage per type
    must sit near the nominal 90% (finite-sample slack allowed)."""
    reg = load_all()
    out = reg["conformal_interval_coverage"][0](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(out) == 5
    for r in out:
        assert 840000 <= r.coverage_micro <= 960000, (
            r.event_type,
            r.coverage_micro,
        )
