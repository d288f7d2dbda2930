"""Boundary tests for queries_ext11: canonical-survivor accounting on a
known duplicate topology, and k-per-group with undersized classes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_canonical_corpus_keeps_min_id_per_cluster(spark, tmp_path):
    # docs 1,2,3 are identical (one cluster; survivor = 1); doc 10 shares
    # nothing (untouched); sources split so accounting is per-source.
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight nine ten"
    rows = [
        (1, dup, "en", "sA", 10),
        (2, dup, "en", "sA", 20),
        (3, dup, "en", "sB", 30),
        (10, uniq, "en", "sB", 40),
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["near_dup_canonical_corpus"]
    out = {r["source"]: r for r in fn(spark, str(tmp_path)).collect()}
    # sA: docs 1,2 -> 1 survives, 2 removed
    assert out["sA"]["n_docs"] == 2
    assert out["sA"]["n_removed"] == 1
    assert out["sA"]["surviving_chars"] == 10
    # sB: doc 3 removed (cluster canon is 1, in sA); doc 10 survives
    assert out["sB"]["n_removed"] == 1
    assert out["sB"]["n_survivors"] == 1
    assert out["sB"]["surviving_chars"] == 40


def test_k_per_group_caps_and_exhausts(spark, tmp_path):
    d = dt.datetime(2024, 1, 1)
    # 'view': 200 rows -> exactly 50 sampled; 'signup': 7 rows -> all 7.
    rows = [(i, d, i, "view", 1.0, "{}") for i in range(200)]
    rows += [(1000 + i, d, i, "signup", 1.0, "{}") for i in range(7)]
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["k_per_group_sample"]
    df = fn(spark, str(tmp_path))
    out = {r["event_type"]: r["n"] for r in df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == {"view": 50, "signup": 7}
    # determinism: two runs pick identical event_ids
    ids1 = sorted(r["event_id"] for r in df.collect())
    ids2 = sorted(r["event_id"] for r in fn(spark, str(tmp_path)).collect())
    assert ids1 == ids2


def test_k_per_group_plan_uses_window_group_limit(spark, tmp_path):
    d = dt.datetime(2024, 1, 1)
    rows = [(i, d, i, "view", 1.0, "{}") for i in range(60)]
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["k_per_group_sample"]
    plan = fn(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rank pushdown: per-partition top-k heap
