"""scaled_shuffle_partitions (VERDICT r10 #1): the volume-build SHJ
lanes derive their shuffle width from input size instead of the session
constant — tools/SKEW_PROBE_30X.json measured the bigram count-join's
spill-less SHJ build OOMing at the default 32 partitions (~356 MB build
per partition) and running clean at 128 (~85 MB)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    scaled_shuffle_partitions,
)


def test_floor_at_default_parallelism(spark):
    small = spark.range(100)
    n = scaled_shuffle_partitions(small, rows_per_partition=1000)
    assert n == spark.sparkContext.defaultParallelism  # ceil(0.1) < floor


def test_scales_linearly_with_rows(spark):
    df = spark.range(1_000_000)
    n = scaled_shuffle_partitions(df, rows_per_partition=10_000)
    assert n == 100


def test_cap(spark):
    df = spark.range(1_000_000)
    n = scaled_shuffle_partitions(df, rows_per_partition=1, cap=64)
    assert n == 64


def test_build_side_repartition_aligns_probe_exchange(spark):
    """The pattern the SHJ lanes use: repartition the COUNT frame after
    its agg; EnsureRequirements must align the probe side's exchange to
    the same explicit width (so the probe exchange keeps its
    ENSURE_REQUIREMENTS origin and AQE skew-splitting stays possible),
    and the map-side partial combine must survive."""
    raw = spark.range(100_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("x")
    )
    cnt = (
        raw.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .repartition(64, "k")
    )
    plan = (
        raw.join(cnt.hint("shuffle_hash"), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
    assert "partial_count" in plan  # combine kept below the agg exchange
    probe = re.findall(
        r"hashpartitioning\(k#\d+L?, (\d+)\), ENSURE_REQUIREMENTS", plan
    )
    assert "64" in probe  # probe aligned to the scaled build width


def test_bigram_lane_builds_ride_scaled_repartition(spark, tmp_path):
    """bigram_lm_surprise's three SHJ builds must carry an explicit
    REPARTITION_BY_NUM at the scaled width (not the session default
    implicitly), with partial aggregation still below the agg shuffles."""
    from shortvideohybridanalyticslakehouse_spark.plans.registry import (
        load_all,
    )

    # 45k docs -> ceil(45000/10000) = 5 partitions: above the local[4]
    # floor AND distinct from the session shuffle width, so the scaled
    # repartition can't be collapsed as redundant
    rows = [
        (i, "tok%d a b tok%d" % (i % 7, (i + 1) % 5), "xx",
         "s%d" % (i % 3), 20)
        for i in range(1, 45_001)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    df = load_all()["bigram_lm_surprise"][0](spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall("ShuffledHashJoin", plan)) == 3
    # all three builds carry the scaled explicit width
    assert len(re.findall(r", 5\), REPARTITION_BY_NUM", plan)) == 3
    assert "partial_count" in plan
