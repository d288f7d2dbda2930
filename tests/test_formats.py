"""Multi-format source/sink round-trips + ORC pushdown parity.

Every supported format must round-trip the events fixture (timestamps,
nulls, doubles) value-identically under an explicit schema; ORC must
additionally prove it keeps the columnar contract (filter pushdown +
column pruning in the scan node) so it is a genuine drop-in for parquet,
not just a serializer.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.sources import formats
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    # include every value class: timestamp, string, long, double, nulls
    return load_table(spark, SF_DIR, "events")


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_round_trip_value_identical(spark, tmp_path, fmt):
    src = _events(spark)
    path = os.path.join(str(tmp_path), fmt)
    formats.write_table(src, path, fmt)
    back = formats.read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_pushdown_and_pruning(spark, tmp_path):
    src = _events(spark)
    path = os.path.join(str(tmp_path), "orc")
    formats.write_table(src, path, "orc")
    q = (
        formats.read_table(spark, path, "orc")
        .filter(F.col("user_id") == 7)
        .select("user_id", "event_type")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" not in read_schema  # pruned: only the 2 projected cols read


def test_unsupported_format_and_missing_schema_fail_loudly(spark, tmp_path):
    src = _events(spark)
    with pytest.raises(ValueError, match="unsupported format"):
        formats.write_table(src, str(tmp_path), "avro")
    with pytest.raises(ValueError, match="explicit schema"):
        formats.read_table(spark, str(tmp_path), "csv")


def test_avro_capability_reported_not_assumed(spark):
    # this image has no spark-avro module; the capability probe must say
    # so (and if an image ever gains it, this test tells us to wire it in)
    assert formats.avro_available(spark) is False
