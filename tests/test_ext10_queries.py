"""Boundary tests for queries_ext10: closed-form entropy, bigram
tie-break at the LIMIT edge, packing bucket boundaries, skew factors, and
decay weights at exact day offsets."""

from __future__ import annotations

import datetime as dt
import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_entropy_closed_form(spark, tmp_path):
    # "a a b b" -> H = 1 bit; "x x x x" -> H = 0; "p q r s" -> H = 2.
    rows = [
        (1, "a a b b", "en", "s", 7),
        (2, "x x x x", "en", "s", 7),
        (3, "p q r s", "en", "s", 7),
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["doc_token_entropy"]
    out = {r["doc_id"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert out[1]["entropy_bits"] == 1.0 and out[1]["n_distinct"] == 2
    assert out[2]["entropy_bits"] == 0.0
    assert out[3]["entropy_bits"] == 2.0 and out[3]["n_tok"] == 4


def test_top_bigrams_count_then_lex_order(spark, tmp_path):
    # "b c" x2, "a b" x2 (tie -> 'a b' first), "c d" x1.
    rows = [
        (1, "b c", "en", "s", 3),
        (2, "b c", "en", "s", 3),
        (3, "a b", "en", "s", 3),
        (4, "a b", "en", "s", 3),
        (5, "c d", "en", "s", 3),
        (6, "solo", "en", "s", 4),  # <2 tokens: contributes nothing
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["top_bigrams"]
    got = [(r["bigram"], r["cnt"]) for r in fn(spark, str(tmp_path)).collect()]
    assert got == [("a b", 2), ("b c", 2), ("c d", 1)]


def test_packing_bucket_boundaries(spark, tmp_path):
    # 32 tokens -> bucket 32 (inclusive cap); 33 -> 64; 300 -> 256 overflow
    # bucket (the catch-all).
    def doc(i, n):
        return (i, " ".join(["w"] * n), "en", "s", 2 * n)

    rows = [doc(1, 32), doc(2, 33), doc(3, 300)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["token_length_bucket_packing"]
    out = {r["bucket_cap"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert out[32]["n_docs"] == 1 and out[32]["waste_ratio"] == 0.0
    assert out[64]["real_tokens"] == 33
    assert out[64]["waste_ratio"] == round(1 - 33 / 64, 6)
    assert out[256]["real_tokens"] == 300  # overflow keeps real count


def test_skew_profile_shares_and_factor(spark, tmp_path):
    d = dt.datetime(2024, 1, 1)
    # user 1: 6 events, users 2..4: 2 each -> total 12, n_keys 4.
    rows = [(i, d, 1, "view", 1.0, "{}") for i in range(6)]
    rows += [(100 + u * 10 + i, d, u, "view", 1.0, "{}") for u in (2, 3, 4) for i in range(2)]
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_key_skew_profile"]
    got = fn(spark, str(tmp_path)).collect()
    assert got[0]["user_id"] == 1 and got[0]["share"] == 0.5
    assert got[0]["skew_vs_uniform"] == 2.0  # 6 * 4 / 12
    # ties among users 2,3,4 break by user_id asc
    assert [r["user_id"] for r in got[1:]] == [2, 3, 4]


def test_time_decay_exact_day_offsets(spark, tmp_path):
    anchor = dt.datetime(2024, 1, 10)
    rows = [
        (1, anchor, 7, "view", 10.0, "{}"),  # weight 1
        (2, anchor - dt.timedelta(days=1), 7, "view", 10.0, "{}"),  # e^-1
        (3, anchor - dt.timedelta(days=2), 7, "view", 10.0, "{}"),  # e^-2
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["time_decay_engagement"]
    r = fn(spark, str(tmp_path)).collect()[0]
    expected = 10.0 * (1 + math.exp(-1) + math.exp(-2))
    assert r["n_events"] == 3
    assert r["decayed_value"] == round(expected, 4)
