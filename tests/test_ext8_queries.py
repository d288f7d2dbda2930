"""Boundary tests for queries_ext8: moment-derived stats against closed-
form expectations, and the mode tie-break."""

from __future__ import annotations

import datetime as dt
import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def test_outlier_stats_match_closed_form(spark, tmp_path):
    # values 0..9 plus one 1000: mean/std computable exactly; only the
    # 1000 exceeds 3 sigma.
    d = dt.datetime(2024, 1, 1)
    vals = list(range(10)) + [1000]
    rows = [
        (i, d, 1, "view", float(v), "{}") for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["event_value_outliers"]
    r = fn(spark, str(tmp_path)).collect()[0]
    n = len(vals)
    mu = sum(vals) / n
    sigma = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
    expected = sum(1 for v in vals if abs(v - mu) > 3 * sigma)
    assert r["n_events"] == n
    assert r["n_outliers"] == expected == 1
    assert r["outlier_rate"] == round(expected / n, 6)


def test_mode_breaks_ties_lexicographically(spark, tmp_path):
    rows = [
        (1, "x", "B1", "zeta", 1, 1.0),
        (2, "x", "B1", "zeta", 1, 1.0),
        (3, "x", "B1", "alpha", 1, 1.0),
        (4, "x", "B1", "alpha", 1, 1.0),   # tie 2-2 -> alpha wins (lex min)
        (5, "x", "B2", "only", 1, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    fn, _ = REGISTRY["brand_mode_part_type"]
    out = {r["p_brand"]: (r["mode_type"], r["n_parts"]) for r in fn(spark, str(tmp_path)).collect()}
    assert out == {"B1": ("alpha", 2), "B2": ("only", 1)}
