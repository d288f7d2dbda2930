"""Z-order layout: interleave arithmetic + quad-locality of the writer."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.ddl import (
    write_zordered,
    zorder_value,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_zorder_value_interleave(spark):
    # z(x=0b11, y=0b01) = x bits at even positions + y bits at odd:
    # x=3 -> 0b0101, y=1 -> 0b0010  => z = 0b0111 = 7
    df = spark.range(1).select(
        zorder_value(F.lit(3), F.lit(1), bits=4).alias("z"),
        zorder_value(F.lit(0), F.lit(0), bits=4).alias("z0"),
        zorder_value(F.lit(15), F.lit(15), bits=4).alias("zmax"),
    )
    row = df.first()
    assert row.z == 7
    assert row.z0 == 0
    assert row.zmax == 255  # all 8 low bits set


def test_zorder_write_produces_aligned_quads(spark, tmp_path):
    # full 32x32 grid, 16 z-prefix buckets -> each bucket is EXACTLY an
    # aligned 8x8 quad: 64 rows, both spans 8. A single-column sort would
    # give 2x32 stripes (span 32 in y) instead.
    import datetime as dt

    rows = [
        (x * 32 + y, dt.datetime(2024, 1, 1), x, "view", float(y), "{}")
        for x in range(32)
        for y in range(32)
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA).select(
        F.col("user_id").alias("x"), F.col("value").cast("long").alias("y")
    )
    out = os.path.join(str(tmp_path), "zordered")
    write_zordered(df, out, "x", "y", bits=5, n_files=16)

    dirs = glob.glob(os.path.join(out, "zbucket=*"))
    assert len(dirs) == 16
    back = spark.read.parquet(out)
    stats = (
        back.groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert all(r.n == 64 and r.xs == 7 and r.ys == 7 for r in stats)


def test_zorder_audit_bbox_bounded(spark, tmp_path):
    # the registry query: every aligned prefix bucket must bound both
    # dims at <= 128 (10-bit dims, 64 buckets -> 128x128 quads)
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), i * 37 % 1024, "view", (i * 53 % 1024) / 10.0, "{}")
        for i in range(2000)
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["zorder_locality_audit"]
    res = fn(spark, str(tmp_path)).collect()
    assert res, "no buckets produced"
    for r in res:
        assert r.x_max - r.x_min <= 127
        assert r.y_max - r.y_min <= 127
        assert r.bbox_area <= 128 * 128


def test_zorder_nd_matches_2d_and_bounds_3d(spark):
    from shortvideohybridanalyticslakehouse_spark.plans.ddl import zorder_value_nd

    # n=2 reproduces zorder_value bit-for-bit
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    ).select(
        zorder_value("x", "y", bits=3).alias("z2"),
        zorder_value_nd(["x", "y"], bits=3).alias("znd"),
    )
    assert df.filter(F.col("z2") != F.col("znd")).count() == 0

    # 3-D: aligned prefix buckets bound EVERY dimension
    pts = spark.createDataFrame(
        [(x, y, w) for x in range(8) for y in range(8) for w in range(8)],
        "x long, y long, w long",
    ).withColumn("z", zorder_value_nd(["x", "y", "w"], bits=3))
    # top 3 bits (one per dim) -> 8 octants of exactly a 4x4x4 cube each
    stats = (
        pts.groupBy(F.shiftright(F.col("z"), 6).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
            (F.max("w") - F.min("w")).alias("ws"),
        )
        .collect()
    )
    assert len(stats) == 8
    assert all(r.n == 64 and r.xs == 3 and r.ys == 3 and r.ws == 3 for r in stats)


def test_zorder_nd_rejects_overflow(spark):
    import pytest

    from shortvideohybridanalyticslakehouse_spark.plans.ddl import zorder_value_nd

    with pytest.raises(ValueError):
        zorder_value_nd(["a", "b", "c", "d"], bits=16)
