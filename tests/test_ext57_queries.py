"""Round-57 extension: from-scratch Bloom filter membership audit."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_bloom_fixture_invariants(spark):
    fn, _ = REGISTRY["bloom_membership_audit"]
    r = fn(spark, SF).collect()[0]
    assert r.n_false_negatives == 0  # the Bloom guarantee
    assert r.n_bloom_positive >= r.n_true_members
    assert r.n_bloom_positive - r.n_true_members == r.n_false_positives
    assert r.fpr >= 0.0


def test_bloom_forced_false_positives(spark):
    """Load the 65,536-bit filter with 20k members (k*n/m > 1 — most
    bits set) and probe 100k keys: false positives MUST appear (the
    deterministic hash family makes the exact count reproducible), and
    false negatives must remain exactly zero."""
    d = tempfile.mkdtemp()
    spark.range(1, 20_001).select(
        F.col("id").alias("c_custkey"),
        F.lit("BUILDING").alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(d + "/customer.parquet")
    spark.range(1, 100_001).select(
        F.col("id").alias("o_custkey")
    ).write.mode("overwrite").parquet(d + "/orders.parquet")
    fn, _ = REGISTRY["bloom_membership_audit"]
    r = fn(spark, d).collect()[0]
    assert r.n_probes == 100_000 and r.n_true_members == 20_000
    assert r.n_false_negatives == 0
    assert r.n_false_positives > 0  # saturated filter must misfire
    assert 0.0 < r.fpr < 0.5
    assert r.n_bloom_positive == r.n_true_members + r.n_false_positives
