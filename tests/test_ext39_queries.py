"""Closed-form fixtures for round-39 (MAD outliers, weighted sampling)."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
T0 = dt.datetime(2024, 1, 1)


def test_mad_outlier_boundary(spark, tmp_path):
    # values [1..9] + one extreme 1000: median 5.5, adev median (MAD)
    # robust to the outlier; the 3-sigma rule would swallow it, MAD flags it
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    spark.createDataFrame(
        [(i, T0, 1, "view", v, "{}") for i, v in enumerate(vals)], EV_SCHEMA
    ).write.parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["event_value_mad_outliers"]
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r.n == 10
    assert r.med == 5.5
    # adevs: |1..9 - 5.5| = 4.5,3.5,...,0.5... plus 994.5 -> median 2.5
    assert r.mad == 2.5
    # threshold = 3.5*1.4826*2.5 = 12.97...; only 1000 exceeds it
    assert r.n_outliers == 1


def test_weighted_sample_prefers_heavy_docs_on_tied_hash_scale(spark, tmp_path):
    # u^(1/w) is increasing in w for u in (0,1): with IDENTICAL u the
    # heavier doc always outranks the lighter one. We can't pin u (it's
    # md5-derived), so assert the invariant instead: keys are in [0,1],
    # the output is the top-25 by (key desc, doc_id), and every returned
    # w is positive.
    docs = [
        (i, " ".join(f"t{j}" for j in range(1 + (i % 40))), "en", "s0", 0)
        for i in range(60)
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["weighted_sample_topk"]
    rows = fn(spark, str(tmp_path)).collect()
    assert len(rows) == 25
    keys = [r.skey for r in rows]
    assert all(0.0 <= k <= 1.0 for k in keys)
    assert keys == sorted(keys, reverse=True)
    assert all(r.w >= 1 for r in rows)
