"""Boundary tests for queries_ext21: bitmap bucket-boundary exactness,
sparsity closed forms, and boolean-rollup truth tables."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_bitmap_distinct_exact_across_bucket_boundary(spark, tmp_path):
    # Ids straddling the 32768-bit bitmap bucket boundary and duplicated
    # across days must still count exactly once each.
    day1 = dt.datetime(2024, 1, 1, 12, 0, 0)
    day2 = dt.datetime(2024, 1, 2, 12, 0, 0)  # same ISO week
    ids = [1, 2, 32768, 32769, 65536]  # buckets 1, 1, 2, 2, 3
    rows = [(i, day1, u, "view", 0.0, "{}") for i, u in enumerate(ids)] + [
        (100 + i, day2, u, "view", 0.0, "{}") for i, u in enumerate(ids[:3])
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["weekly_bitmap_exact_distinct"]
    got = fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["exact_weekly_users"] == 5  # dups collapse, buckets sum


def test_sparsity_closed_form(spark, tmp_path):
    # label 0: vec of 64 zeros -> near_zero_frac 1.0, no extreme dims.
    # label 1: 32 zeros + 32 threes -> frac 0.5, extreme present.
    rows = [
        (0, [0.0] * 64, 0),
        (1, [0.0] * 32 + [3.0] * 32, 1),
    ]
    spark.createDataFrame(rows, EMB_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    fn, _ = REGISTRY["embedding_sparsity_profile"]
    got = {r["label"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert got[0]["near_zero_frac"] == 1.0
    assert got[0]["n_with_extreme_dim"] == 0
    assert got[1]["near_zero_frac"] == 0.5
    assert got[1]["n_with_extreme_dim"] == 1


def test_behavior_flags_truth_table(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 1, "view", 1.0, "{}"),
        (2, t, 1, "purchase", 2.0, "{}"),   # user 1: all_nonneg, purchased
        (3, t, 2, "view", -1.0, "{}"),      # user 2: negative value
        (4, t, 2, "error", 1.0, "{}"),      # ... and an error
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_behavior_flags"]
    got = {r["user_id"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert got[1]["all_nonneg"] and got[1]["ever_purchased"] and got[1]["error_free"]
    assert not got[2]["all_nonneg"]
    assert not got[2]["ever_purchased"]
    assert not got[2]["error_free"]
