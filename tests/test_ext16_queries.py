"""Tests for queries_ext16 (VARIANT + mergeable HLL) and the runtime
bloom-filter join-pruning mechanism."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_variant_profile_matches_string_json_path(spark):
    # The VARIANT path must agree exactly with the legacy get_json_object
    # string path on the same data.
    fn, _ = REGISTRY["variant_props_profile"]
    got = {r["event_type"]: r for r in fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    legacy = {
        r["event_type"]: r
        for r in ev.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count("k").alias("n_with_k"), F.sum("k").alias("k_sum"))
        .collect()
    }
    assert set(got) == set(legacy)
    for et in got:
        assert got[et]["n_with_k"] == legacy[et]["n_with_k"]
        assert got[et]["k_sum"] == legacy[et]["k_sum"]


def test_hll_union_estimate_within_error_envelope(spark):
    # lgK=14 -> relative standard error ~0.81%; assert 5 sigma.
    fn, _ = REGISTRY["weekly_hll_union_estimate"]
    got = {r["week"]: r["est_weekly_users"] for r in fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r["week"]: r["exact"]
        for r in ev.select(F.date_trunc("week", "ts").alias("week"), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for wk, est in got.items():
        assert abs(est - exact[wk]) <= max(5, 0.05 * exact[wk]), (
            wk,
            est,
            exact[wk],
        )


def test_hll_union_of_disjoint_days_counts_all(spark):
    # Two disjoint daily user sets must merge to ~the union size, proving
    # the sketch is genuinely mergeable state (not a re-scan).
    rows = [(d, u) for d in (1, 2) for u in range(d * 1000, d * 1000 + 500)]
    df = spark.createDataFrame(rows, "d int, user_id long").select(
        F.to_timestamp(F.format_string("2026-01-0%d 12:00:00", "d")).alias("ts"),
        "user_id",
    )
    daily = df.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("bigint").alias("n")
    ).collect()[0]["n"]
    assert abs(merged - 1000) <= 20


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    # With the size gates lowered, a selective dim filter must inject a
    # bloom filter (might_contain) into the fact scan side — the runtime
    # semi-join pruning that matters at 100 TB (default gates: creation
    # side <= 10MB, application side >= 10GB scan).
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
