"""Verification/QA library — the reference's verifier scripts as reusable
checks (SURVEY.md §5.3; src/scripts/verify_*.py, check_*.py).

Each check returns a (passed: bool, details: dict) pair computed with one
small Spark action; `signoff` aggregates them into the unified gate report
(ref: verify_mic38_sprint1_signoff.py:141-510 — 11 named gates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
    duplicate_key_groups,
)

Check = tuple[bool, dict]


def grain_unique(df: DataFrame, key_cols: Sequence[str]) -> Check:
    """Gold/dim contract: zero duplicate grain keys."""
    dups = duplicate_key_groups(df, key_cols).count()
    return dups == 0, {"duplicate_groups": dups, "grain": list(key_cols)}


def non_negative(df: DataFrame, cols: Sequence[str]) -> Check:
    """Gold contract: metric counts are never negative."""
    preds = [F.sum(F.when(F.col(c) < 0, 1).otherwise(0)).alias(c) for c in cols]
    row = df.agg(*preds).first()
    bad = {c: row[c] for c in cols if row[c]}
    return not bad, {"negative_counts": bad}


def no_null_required(df: DataFrame, cols: Sequence[str]) -> Check:
    preds = [F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in cols]
    row = df.agg(*preds).first()
    bad = {c: row[c] for c in cols if row[c]}
    return not bad, {"null_required": bad}


def invalid_rate_bounded(
    valid: DataFrame, invalid: DataFrame, max_rate: float = 0.20
) -> Check:
    """Contract-enforcement gate: invalid/(valid+invalid) <= max_rate."""
    n_valid, n_invalid = valid.count(), invalid.count()
    rate = n_invalid / max(n_valid + n_invalid, 1)
    return rate <= max_rate, {
        "invalid_rate": round(rate, 4),
        "valid": n_valid,
        "invalid": n_invalid,
        "max_rate": max_rate,
    }


def watermark_drop_ratio(
    input_distinct_ids: int, gold_event_sum: int, max_ratio: float = 0.05
) -> Check:
    """Exact-distinct input vs summed gold counts — late-drop accounting."""
    dropped = max(input_distinct_ids - gold_event_sum, 0)
    ratio = dropped / max(input_distinct_ids, 1)
    return ratio <= max_ratio, {
        "dropped": dropped,
        "ratio": round(ratio, 4),
        "max_ratio": max_ratio,
    }


def freshness_within(
    df: DataFrame, ts_col: str, now_ts, max_age_seconds: float
) -> Check:
    """Freshness SLA: age of MAX(ts) vs a supplied 'now' anchor."""
    row = df.agg(F.max(F.col(ts_col)).alias("max_ts")).first()
    if row.max_ts is None:
        return False, {"max_ts": None}
    age = (now_ts - row.max_ts).total_seconds()
    return age <= max_age_seconds, {
        "age_seconds": age,
        "max_age_seconds": max_age_seconds,
    }


def expected_action_agreement(
    decisions: DataFrame,
    expected: DataFrame,
    min_hit_rate: float = 0.90,
) -> Check:
    """J8: latest decision per video vs qa.expected_actions (>=90% hit).

    ``decisions``: decision-context rows (video_id, window_start,
    decision_type_preview). The per-video verdict is the modal actionable
    decision inside the expected window (the reference checks hit-rate over
    the run window, scenario matrix doc:285-295).
    """
    exp = expected.select(
        "video_id",
        F.col("window_start").alias("exp_window_start"),
        F.col("window_end").alias("exp_window_end"),
        "expected_action",
    )
    # LEFT join from ground truth with the window predicate IN the join
    # condition: an expected video with zero decision rows in its window
    # (none at all, or all outside it) keeps one NULL-decision row and
    # stays in the denominator — an inner join (or post-join filter) would
    # drop it and inflate the hit rate. Zero in-window rows = a hit only
    # when the expectation is NO_ACTION.
    dec = decisions.select(
        F.col("video_id").alias("dec_video_id"),
        "window_start",
        "decision_type_preview",
    )
    joined = exp.join(
        dec,
        (F.col("video_id") == F.col("dec_video_id"))
        & (F.col("window_start") >= F.col("exp_window_start"))
        & (F.col("window_start") < F.col("exp_window_end")),
        "left",
    )
    # per video: did ANY minute produce the expected action (or, for
    # NO_ACTION expectations, did NO minute produce an actionable one)?
    per_video = joined.groupBy("video_id", "expected_action").agg(
        F.sum(
            F.when(
                F.col("decision_type_preview") == F.col("expected_action"), 1
            ).otherwise(0)
        ).alias("hits"),
        F.sum(
            F.when(F.col("decision_type_preview") != "NO_ACTION", 1).otherwise(0)
        ).alias("actionable_minutes"),
    )
    verdict = per_video.withColumn(
        "ok",
        F.when(F.col("expected_action") == "NO_ACTION", F.col("actionable_minutes") == 0)
        .otherwise(F.col("hits") > 0),
    )
    row = verdict.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
    ).first()
    rate = (row.n_ok or 0) / max(row.n or 0, 1)
    return rate >= min_hit_rate, {
        "videos": row.n,
        "agree": row.n_ok,
        "hit_rate": round(rate, 4),
        "min_hit_rate": min_hit_rate,
    }


def signoff(checks: dict[str, Check]) -> dict:
    """Unified gate report: overall PASS iff every named gate passed."""
    report = {
        name: {"passed": ok, **details} for name, (ok, details) in checks.items()
    }
    report["_overall"] = {"passed": all(ok for ok, _ in checks.values())}
    return report
