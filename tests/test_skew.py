"""Skew-mitigation operators: result-equivalence vs the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.skew import (
    salted_join,
    two_phase_agg,
    with_salt,
)


def _skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i, float(i % 7)) for i in range(900)] + [
        (f"k{i}", i, float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, seq int, v double")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, tag string"
    )
    for how in ("inner", "left"):
        plain = big.join(small, ["key"], how)
        salted = salted_join(big, small, ["key"], how=how, buckets=8)
        assert salted.count() == plain.count()
        a = {tuple(r) for r in plain.select("key", "seq", "tag").collect()}
        b = {tuple(r) for r in salted.select("key", "seq", "tag").collect()}
        assert a == b


def test_salt_spreads_hot_key(spark):
    salted = with_salt(_skewed(spark).repartition(8), 8)
    per_bucket = (
        salted.filter(F.col("key") == "hot").groupBy("_salt").count().collect()
    )
    # the hot key must land in several buckets, not one
    assert len(per_bucket) >= 4


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum")
    )
    salted = two_phase_agg(
        df,
        ["key"],
        partial_aggs={"n": F.count(F.lit(1)), "v_sum": F.sum("v")},
        final_aggs={"n": F.sum("n").cast("long"), "v_sum": F.sum("v_sum")},
    )
    a = {(r.key, r.n, round(r.v_sum, 6)) for r in plain.collect()}
    b = {(r.key, r.n, round(r.v_sum, 6)) for r in salted.collect()}
    assert a == b
