"""with_tiny_rank: the bounded-frame rank idiom (VERDICT r5 #2).

The helper must replay row_number() OVER (ORDER BY ...) bit-for-bit on
tiny frames while planning NO WindowExec, and must enforce the declared
frame bound when SVH_ASSERT_TINY_FRAMES is set (conftest sets it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.ranks import with_tiny_rank


def _window_oracle(df, order):
    spec = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order
    ]
    return df.withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy(*spec))
    )


@pytest.mark.parametrize(
    "order",
    [
        [("v", "asc"), ("k", "asc")],
        [("v", "desc"), ("k", "asc")],
        [("v", "desc"), ("k", "desc")],
    ],
)
def test_matches_row_number(spark, order):
    rows = [(3.5, "a"), (1.0, "b"), (3.5, "c"), (2.0, "d"), (-1.0, "e")]
    df = spark.createDataFrame(rows, "v double, k string")
    got = {
        (r.v, r.k): r.rn
        for r in with_tiny_rank(df, order, max_rows=10).collect()
    }
    want = {
        (r.v, r.k): r.rn for r in _window_oracle(df, order).collect()
    }
    assert got == want


def test_four_key_order(spark):
    rows = [
        (2, "x", "p", "q"),
        (2, "x", "p", "a"),
        (2, "w", "z", "z"),
        (9, "a", "a", "a"),
    ]
    df = spark.createDataFrame(rows, "c int, t0 string, t1 string, t2 string")
    order = [("c", "desc"), ("t0", "asc"), ("t1", "asc"), ("t2", "asc")]
    got = sorted(
        (r.rn, r.c, r.t0, r.t1, r.t2)
        for r in with_tiny_rank(df, order, max_rows=4).collect()
    )
    assert got == [
        (1, 9, "a", "a", "a"),
        (2, 2, "w", "z", "z"),
        (3, 2, "x", "p", "a"),
        (4, 2, "x", "p", "q"),
    ]


def test_no_window_exec_in_plan(spark):
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    ranked = with_tiny_rank(df, [("v", "desc"), ("k", "asc")], max_rows=5)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_bound_enforced(spark, monkeypatch):
    monkeypatch.setenv("SVH_ASSERT_TINY_FRAMES", "1")
    df = spark.range(100).select(F.col("id").alias("v"))
    with pytest.raises(AssertionError, match="tiny-frame invariant"):
        with_tiny_rank(df, [("v", "asc")], max_rows=10)


def test_bad_direction_rejected(spark):
    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        with_tiny_rank(df, [("v", "descending")])
