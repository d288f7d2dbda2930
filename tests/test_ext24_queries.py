"""Boundary tests for queries_ext24: Benford digit extraction (truncate,
not round) and TWAP closed forms."""

from __future__ import annotations

import datetime as dt
import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
T0 = dt.datetime(2026, 1, 1)


def test_benford_digit_truncates_not_rounds(spark, tmp_path):
    # 89999.99 must count as digit 8 (floor), never 9 (round); 0.5 is
    # excluded by the >= 1 guard.
    rows = [
        (1, 1, "O", 89999.99, T0, "2-HIGH"),
        (2, 1, "O", 19.0, T0, "2-HIGH"),
        (3, 1, "O", 0.5, T0, "2-HIGH"),
    ]
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    fn, _ = REGISTRY["benford_first_digit_audit"]
    got = {r["d"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert set(got) == {8, 1}
    assert got[8]["n"] == 1 and got[1]["n"] == 1
    assert got[1]["observed"] == 0.5
    assert got[1]["expected"] == round(math.log10(2), 6)


def test_twap_weights_by_holding_interval(spark, tmp_path):
    # user 1: value 10 held 10s, then value 90 held 30s, final value
    # (no next event) contributes nothing -> twap = (10*10 + 90*30)/40 = 70.
    def at(sec):
        return dt.datetime(2026, 1, 1, 10, 0, sec)

    rows = [
        (1, at(0), 1, "view", 10.0, "{}"),
        (2, at(10), 1, "view", 90.0, "{}"),
        (3, at(40), 1, "view", 555.0, "{}"),  # open-ended, excluded
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_time_weighted_avg_value"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["n_intervals"] == 2
    assert row["observed_us"] == 40_000_000
    assert row["twap_value"] == 70.0
