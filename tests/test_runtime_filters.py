"""Runtime (bloom-filter) join pruning — the scan-side row filter Spark
injects on the probe side of a selective shuffle join, so the big fact
scan drops non-joining rows BEFORE the exchange (at 100 TB this is the
difference between shuffling the whole fact table and shuffling the ~1%
that can possibly match).

The engine keeps the optimizer defaults (`runtime.bloomFilter.enabled`
is on in Spark 4); this gate verifies the mechanism actually fires for
our declarative join shapes — i.e. nothing in how we build plans
(subqueries, HOFs, mapInPandas stages) defeats the injection — by
lowering the size thresholds that gate it at fixture scale.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

_CONFS = {
    # fixture tables are far below the production 10MB creation threshold;
    # raise/lower the gates so the rule can demonstrate itself at test SF
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_spark(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_probe_side(bloom_spark):
    docs = bloom_spark.read.parquet(f"{SF_DIR}/documents.parquet")
    keys = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    plan = (
        docs.join(keys, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "might_contain" in plan, "runtime bloom filter not injected"


def test_join_results_identical_with_and_without_bloom(bloom_spark):
    docs = bloom_spark.read.parquet(f"{SF_DIR}/documents.parquet")
    keys = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    with_bloom = sorted(
        r["doc_id"] for r in docs.join(keys, "doc_id").select("doc_id").collect()
    )
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        without = sorted(
            r["doc_id"]
            for r in docs.join(keys, "doc_id").select("doc_id").collect()
        )
    finally:
        bloom_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert with_bloom == without and len(with_bloom) > 0
