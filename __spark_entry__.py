"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query logic lives in ``shortvideohybridanalyticslakehouse_spark/plans/queries.py``
(one registry entry per implemented operator family from SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def _ensure_confs(spark: SparkSession) -> SparkSession:
    # The driver may hand us a vanilla session; pin the confs the engine
    # depends on (UTC event-time semantics, ns-timestamp parquet reads) and
    # the runtime-settable performance confs (a vanilla session defaults to
    # 200 shuffle partitions — far too many tasks at fixture scale — and
    # AQE settings the plans assume; all are session-conf safe to set).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 4)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # See session.py: stops explode-generator expressions from being
    # duplicated into (possibly single-partition) scan stages as inferred
    # size()>0 filters.
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark = _ensure_confs(spark)
    fn, _ = REGISTRY["flagship_decision_context"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure_confs(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: oracle for name, (_, oracle) in REGISTRY.items() if oracle is not None
    }
