"""Round-4 product-analytics composites: ordered funnel + retention."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_funnel_monotone_and_ordered(spark):
    fn, _ = REGISTRY["conversion_funnel_ordered"]
    rows = fn(spark, SF).collect()
    assert [r.step for r in rows] == ["view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    # each step's survivors are a subset of the previous step's
    assert counts[0] >= counts[1] >= counts[2] >= 0
    assert rows[0].avg_secs_from_prev is None
    for r in rows[1:]:
        if r.n_users:
            assert r.avg_secs_from_prev > 0


def test_funnel_strict_ordering_semantics(spark):
    """A user whose only purchase precedes their first click must NOT count
    as converted (the strict event-order contract)."""
    rows = [
        (1, "2024-01-01T00:00:00", 10, "view"),
        (2, "2024-01-01T00:01:00", 10, "click"),
        (3, "2024-01-01T00:02:00", 10, "purchase"),  # converts
        (4, "2024-01-01T00:00:00", 20, "purchase"),  # purchase BEFORE view
        (5, "2024-01-01T00:01:00", 20, "view"),
        (6, "2024-01-01T00:02:00", 20, "click"),
    ]
    import tempfile

    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    fn, _ = REGISTRY["conversion_funnel_ordered"]
    got = {r.step: r.n_users for r in fn(spark, d).collect()}
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_retention_day_zero_counts_every_user(spark):
    fn, _ = REGISTRY["retention_cohorts_daily"]
    rows = fn(spark, SF).collect()
    day0 = sum(r.n_active for r in rows if r.day_no == 0)
    n_users = (
        REGISTRY["distinct_active_users"][0](spark, SF)
        if "distinct_active_users" in REGISTRY
        else None
    )
    # every user is active on their own day 0
    from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

    expect = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert day0 == expect
    assert all(r.day_no >= 0 for r in rows)
