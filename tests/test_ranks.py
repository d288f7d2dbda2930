"""Distributed exact ranking vs the single-partition window truth."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_distributed_row_number_matches_window_global(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select("value", "event_id")
    )
    got = ranks.with_distributed_row_number(
        ev, part_cols=[], order_cols=["value", "event_id"], n_buckets=8
    )
    w = Window.orderBy("value", "event_id")
    want = ev.select(
        "event_id", F.row_number().over(w).cast("bigint").alias("rn")
    )
    joined = got.select("event_id", "_rn").join(want, "event_id")
    assert joined.filter(F.col("_rn") != F.col("rn")).count() == 0
    n = ev.count()
    assert got.select(F.max("_n")).first()[0] == n
    assert got.count() == n


def test_distributed_row_number_matches_window_grouped(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", "event_id")
    )
    got = ranks.with_distributed_row_number(
        ev,
        part_cols=["event_type"],
        order_cols=["value", "event_id"],
        n_buckets=8,
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    want = ev.select(
        "event_id", F.row_number().over(w).cast("bigint").alias("rn")
    )
    joined = got.select("event_id", "_rn").join(want, "event_id")
    assert joined.filter(F.col("_rn") != F.col("rn")).count() == 0


def test_ntile_from_rank_matches_sql_ntile(spark):
    # every (n, tiles) shape incl. n < tiles, exact multiples, remainders
    random.seed(11)
    for n, tiles in [(1, 4), (3, 4), (4, 4), (5, 4), (97, 10), (100, 7)]:
        rows = [(i + 1,) for i in range(n)]
        df = spark.createDataFrame(rows, "rn long").withColumn(
            "n", F.lit(n).cast("long")
        )
        got = {
            r.rn: r.bin
            for r in df.select(
                "rn", ranks.ntile_from_rank(F.col("rn"), F.col("n"), tiles).alias("bin")
            ).collect()
        }
        w = Window.orderBy("rn")
        want = {
            r.rn: r.bin
            for r in df.select("rn", F.ntile(tiles).over(w).alias("bin")).collect()
        }
        assert got == want, f"n={n} tiles={tiles}"


def test_distributed_prefix_sum_matches_window(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", F.col("user_id").cast("bigint").alias("v"))
    )
    got = ranks.with_distributed_prefix_sum(
        ev, part_cols=[], order_cols=["event_id"], value_col="v", n_buckets=8
    )
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    want = ev.select(
        "event_id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("cum")
    )
    joined = got.select("event_id", "_cum_before").join(want, "event_id")
    assert joined.filter(F.col("_cum_before") != F.col("cum")).count() == 0


def test_distributed_row_number_ties_and_single_value(spark):
    # all rows share one value: cut list collapses, single bucket path
    df = spark.createDataFrame(
        [(7.0, i) for i in range(20)], "value double, event_id long"
    )
    got = ranks.with_distributed_row_number(
        df, part_cols=[], order_cols=["value", "event_id"], n_buckets=8
    )
    rns = sorted(r._rn for r in got.collect())
    assert rns == list(range(1, 21))


def test_prefix_max_property_random(spark):
    """Property: for arbitrary (key, value) sets — duplicates of value,
    negative values, any size — the distributed exclusive prefix max
    equals the single-partition window at any bucket count."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import Window as W

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-100, max_value=100), min_size=1, max_size=60
        ),
        n_buckets=st.sampled_from([1, 2, 7, 16]),
    )
    def check(vals, n_buckets):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, v int")
        got = ranks.with_distributed_prefix_max(
            df, [], ["k"], "v", n_buckets=n_buckets
        )
        w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
        want = df.select("k", F.max("v").over(w).alias("pm"))
        j = {r.k: r._max_before for r in got.collect()}
        ww = {r.k: r.pm for r in want.collect()}
        assert j == ww

    check()
