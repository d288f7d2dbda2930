"""Decision boundary tests (reference shape:
tests/test_rt_action_decisioning.py — boundary values at every threshold,
precedence overlaps, rescue isolation, null => NO_ACTION).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.operators.decision import (
    decide_row,
    queue_rows,
    suppress_no_action,
    validate_queue_rows,
    with_decision,
    with_derived_metrics,
    with_flags,
)

GOOD = dict(
    velocity_30m=0.70,
    impressions_30m=200.0,
    completion_30m=0.60,
    skip_30m=0.10,
    play_start_30m=50.0,
    upload_age_minutes=30.0,
)


def d(**over) -> str:
    args = {**GOOD, **over}
    return decide_row(**args)


def test_boost():
    assert d() == C.DECISION_BOOST


def test_boost_boundaries():
    assert d(velocity_30m=C.VELOCITY_P90_THRESHOLD) == C.DECISION_BOOST  # >= inclusive
    assert d(velocity_30m=0.6799) != C.DECISION_BOOST
    assert d(impressions_30m=100.0) == C.DECISION_BOOST
    assert d(impressions_30m=99.0) != C.DECISION_BOOST
    assert d(completion_30m=0.55) == C.DECISION_BOOST
    assert d(skip_30m=0.35) == C.DECISION_BOOST
    assert d(play_start_30m=30.0) == C.DECISION_BOOST
    assert d(play_start_30m=29.0) == C.DECISION_REVIEW  # quality fails


def test_review_quality_fail():
    assert d(completion_30m=0.54) == C.DECISION_REVIEW
    assert d(skip_30m=0.36) == C.DECISION_REVIEW


def test_rescue():
    r = d(
        velocity_30m=0.10,
        impressions_30m=150.0,  # <= p40 160
        upload_age_minutes=60.0,
    )
    assert r == C.DECISION_RESCUE


def test_rescue_age_boundary():
    assert (
        d(velocity_30m=0.10, impressions_30m=150.0, upload_age_minutes=61.0)
        == C.DECISION_NO_ACTION
    )


def test_rescue_needs_quality():
    assert (
        d(
            velocity_30m=0.10,
            impressions_30m=150.0,
            completion_30m=0.10,
            upload_age_minutes=30.0,
        )
        == C.DECISION_NO_ACTION
    )


def test_null_is_conservative():
    assert d(velocity_30m=None) == C.DECISION_NO_ACTION
    assert (
        d(velocity_30m=0.1, impressions_30m=150.0, upload_age_minutes=None)
        == C.DECISION_NO_ACTION
    )


def test_boost_beats_rescue_overlap():
    # candidate+quality+under-exposed+young -> BOOST wins by precedence
    assert (
        d(impressions_30m=150.0, velocity_30m=0.9, upload_age_minutes=10.0)
        == C.DECISION_BOOST
    )


CASES = [
    GOOD,
    {**GOOD, "velocity_30m": 0.5},
    {**GOOD, "completion_30m": 0.2},
    {**GOOD, "velocity_30m": 0.1, "impressions_30m": 150.0},
    {**GOOD, "velocity_30m": None},
    {**GOOD, "impressions_30m": 160.0, "velocity_30m": 0.1},
    {**GOOD, "upload_age_minutes": None, "velocity_30m": 0.1, "impressions_30m": 100.0},
]


def test_dataframe_matches_python_mirror(spark):
    """The Catalyst CASE chain and the pure-python oracle must agree."""
    rows = [
        tuple(c[k] for k in GOOD) for c in CASES
    ]
    df = spark.createDataFrame(
        rows,
        "velocity_30m double, impressions_30m double, completion_30m double, "
        "skip_30m double, play_start_30m double, upload_age_minutes double",
    )
    out = with_decision(
        with_flags(
            df,
            velocity_p90=F.lit(C.VELOCITY_P90_THRESHOLD),
            impressions_p40=F.lit(C.IMPRESSIONS_P40_THRESHOLD),
        )
    )
    got = [r.decision_type for r in out.collect()]
    want = [decide_row(**c) for c in CASES]
    assert got == want


def test_derived_metrics_formulas(spark):
    df = spark.createDataFrame(
        [(10, 2, 50, 40, 5, 8)],
        "likes_30m long, shares_30m long, impressions_30m long, "
        "play_finish_30m long, skips_30m long, play_start_30m long",
    )
    r = with_derived_metrics(df).first()
    assert r.velocity_30m == (10 + 5 * 2) / 100.0  # floor 100
    assert r.completion_30m == 40 / 8.0
    assert r.skip_30m == 5 / 8.0


def test_queue_rows_and_validation(spark):
    df = spark.createDataFrame(
        [
            ("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST),
            ("vid_2", "2026-01-01 00:05:00", C.DECISION_RESCUE),
            ("vid_3", "2026-01-01 00:05:00", C.DECISION_NO_ACTION),
        ],
        "video_id string, window_start string, decision_type string",
    ).withColumn("window_start", F.to_timestamp("window_start"))
    actionable = suppress_no_action(df)
    assert actionable.count() == 2
    q = queue_rows(actionable)
    assert q.columns == list(C.ACTION_QUEUE_COLUMNS)
    rows = {r.video_id: r for r in q.collect()}
    assert rows["vid_1"].priority == 3 and rows["vid_2"].priority == 1
    ttl_b = (rows["vid_1"].expires_at - rows["vid_1"].decided_at).total_seconds()
    ttl_r = (rows["vid_2"].expires_at - rows["vid_2"].decided_at).total_seconds()
    assert ttl_b == 30 * 60 and ttl_r == 15 * 60
    assert len(rows["vid_1"].action_id) == 64  # sha256 hex
    valid, violations = validate_queue_rows(q)
    assert valid.count() == 2 and violations.count() == 0
