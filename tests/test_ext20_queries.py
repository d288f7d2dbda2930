"""Boundary tests for queries_ext20: full-outer one-sided survival and
matryoshka recall closed forms."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_full_outer_keeps_both_one_sided_populations(spark, tmp_path):
    d = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (1, d, 1, "view", 0.0, "{}"),       # user 1: view only
        (2, d, 2, "purchase", 0.0, "{}"),   # user 2: purchase only
        (3, d, 3, "view", 0.0, "{}"),       # user 3: both
        (4, d, 3, "purchase", 0.0, "{}"),
        (5, d, 3, "purchase", 0.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_day_activity_full_outer"]
    got = {r["activity_class"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert got["view_only"]["n_user_days"] == 1
    assert got["view_only"]["purchases"] == 0
    assert got["purchase_only"]["n_user_days"] == 1
    assert got["purchase_only"]["views"] == 0
    assert got["both"]["n_user_days"] == 1
    assert got["both"]["views"] == 1 and got["both"]["purchases"] == 2


def test_matryoshka_recall_perfect_when_prefix_decides(spark, tmp_path):
    # Vectors whose FIRST 8 dims already induce the full ranking ->
    # recall must be exactly 1.0. Query = e1; corpus along e1 with
    # varying magnitude in dim 1 only (cosine identical ordering in
    # 8-dim prefix and 64-dim full).
    def vec(x, tail=0.0):
        return [float(x)] + [0.0] * 7 + [float(tail)] * 56

    rows = [(0, vec(1.0), 0)] + [
        (i, vec(1.0 + 0.1 * i), 0) for i in range(1, 13)
    ]
    spark.createDataFrame(rows, EMB_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    fn, _ = REGISTRY["matryoshka_truncation_recall"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["n_full"] == 10 and row["n_trunc"] == 10
    assert row["n_overlap"] == 10
    assert row["recall_at_10"] == 1.0
