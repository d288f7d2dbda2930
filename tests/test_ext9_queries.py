"""Boundary tests for queries_ext9: quality-filter thresholds at exact
boundaries, stratified-sample rate selection, hopping-window membership,
and centroid cosine on a degenerate (collapsed) label."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_quality_funnel_boundaries(spark, tmp_path):
    # doc A: exactly 20 tokens of length-4 distinct words -> passes all
    # (mean_len 4.0 == LO boundary inclusive; ttr 1.0; top_frac 0.05 <= 0.12).
    words_a = " ".join(f"ab{i:02d}" for i in range(20))
    # doc B: 19 tokens -> fails ONLY min_len (distinct 4-char words again).
    words_b = " ".join(f"cd{i:02d}" for i in range(19))
    # doc C: 20 tokens, one word repeated 20x -> top_frac 1.0 fails
    # repetition AND ttr 0.05 fails ttr; mean len 4.0 passes word_len.
    words_c = " ".join(["wxyz"] * 20)
    _write_docs(
        spark,
        tmp_path,
        [
            (1, words_a, "en", "s1", len(words_a)),
            (2, words_b, "en", "s1", len(words_b)),
            (3, words_c, "en", "s1", len(words_c)),
        ],
    )
    fn, _ = REGISTRY["doc_quality_filter_funnel"]
    r = fn(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_pass_min_len"] == 2  # A, C
    assert r["n_pass_word_len"] == 3  # all exactly 4.0 (inclusive LO)
    assert r["n_pass_ttr"] == 2  # A, B
    assert r["n_pass_repetition"] == 2  # A, B (B top_frac 1/19 <= 0.12)
    assert r["n_pass_all"] == 1  # only A


def test_stratified_sample_rates_per_class(spark, tmp_path):
    # purchase kept at 100%: every purchase row must survive regardless of
    # hash; a 'view' stratum at 10% must never exceed its bucket bound.
    d = dt.datetime(2024, 1, 1)
    rows = [(i, d, i % 7, "purchase", 1.0, "{}") for i in range(50)]
    rows += [(1000 + i, d, i % 7, "view", 1.0, "{}") for i in range(200)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["stratified_event_sample"]
    out = {r["event_type"]: r["n_sampled"] for r in fn(spark, str(tmp_path)).collect()}
    assert out["purchase"] == 50
    assert 0 < out.get("view", 0) < 200  # downsampled, not empty/whole


def test_hopping_window_single_event_lands_in_five_windows(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1, 12, 7, 30)
    spark.createDataFrame(
        [(1, ts, 1, "view", 2.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["hopping_window_event_counts"]
    rows = fn(spark, str(tmp_path)).collect()
    starts = sorted(r["window_start"] for r in rows)
    assert len(rows) == 5
    # windows start at 12:03..12:07, each 5 minutes wide, each count 1
    assert starts[0] == dt.datetime(2024, 1, 1, 12, 3)
    assert starts[-1] == dt.datetime(2024, 1, 1, 12, 7)
    assert all(r["n_events"] == 1 and r["value_sum"] == 2.0 for r in rows)
    assert all((r["window_end"] - r["window_start"]).seconds == 300 for r in rows)


def test_centroid_stats_collapsed_and_orthogonal_labels(spark, tmp_path):
    # label 0: two identical vectors -> centroid == vector, avg_cos == 1.
    # label 1: two orthogonal unit vectors -> centroid (0.5, 0.5),
    # cos(v, c) = 0.5/ (1 * sqrt(0.5)) = 0.7071 for both.
    rows = [
        (1, [3.0, 4.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [1.0, 0.0], 1),
        (4, [0.0, 1.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    fn, _ = REGISTRY["embedding_centroid_stats"]
    out = {r["label"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert out[0]["n_vecs"] == 2
    assert out[0]["centroid_norm"] == 5.0
    assert out[0]["avg_cos_to_centroid"] == 1.0
    assert out[1]["centroid_norm"] == round(0.5**0.5, 4)
    assert out[1]["avg_cos_to_centroid"] == round(0.5 / (0.5**0.5), 4)
