"""Boundary tests for queries_ext6: connected-components correctness on
known graph shapes, fuzzy-match blocking exclusions, and gap-fill
zero-day manufacture.
"""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext6 import (
    connected_components,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def test_connected_components_chain_triangle_and_pair(spark):
    # chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    # triangle 10-11-12, isolated pair 20-21, self-loop 30
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21), (30, 30)],
        "src long, dst long",
    )
    labels = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30,
    }


def test_fuzzy_pairs_respect_block_and_threshold(spark, tmp_path):
    rows = [
        (1, "red ring", "BRAND", "T", 1, 1.0),
        (2, "rad ring", "BRAND", "T", 1, 1.0),    # dist 1, same block
        (3, "cerulean ring", "BRAND", "T", 1, 1.0),  # same block, dist > 4
        (4, "red wing", "BRAND", "T", 1, 1.0),    # dist 1 but block 'wing'
        (5, "red ring", "BRAND", "T", 1, 1.0),    # duplicate name -> distinct
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    fn, _ = REGISTRY["fuzzy_part_name_pairs"]
    out = sorted(
        (r["name_a"], r["name_b"], r["dist"])
        for r in fn(spark, str(tmp_path)).collect()
    )
    assert out == [("rad ring", "red ring", 1)]


def test_gapfill_manufactures_zero_days_inside_span_only(spark, tmp_path):
    d = dt.datetime
    rows = [
        # user 1 active Jan 1 and Jan 3 -> Jan 2 is a manufactured gap
        (1, d(2024, 1, 1, 5), 1, "view", 1.0, "{}"),
        (2, d(2024, 1, 3, 6), 1, "view", 1.0, "{}"),
        (3, d(2024, 1, 3, 7), 1, "click", 1.0, "{}"),
        # user 2 active only Jan 2 -> span is one day, no gaps
        (4, d(2024, 1, 2, 9), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["daily_activity_gapfill"]
    out = {
        r["day"].isoformat(): (
            r["n_users_in_span"], r["n_gap_users"], r["total_events"]
        )
        for r in fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        # Jan 1: only user 1 in span, active (1 event)
        "2024-01-01T00:00:00": (1, 0, 1),
        # Jan 2: user 1 gap + user 2 active
        "2024-01-02T00:00:00": (2, 1, 1),
        # Jan 3: only user 1, two events
        "2024-01-03T00:00:00": (1, 0, 2),
    }
