"""Decision / rule operators (D1-D7, §2.10) + derived-metric formulas (§2.8).

Contract-locked formulas (ref: docs/.../metric-contract.md:22-42;
src/trino/rt_video_metrics_serving.sql:36-38):

    velocity_30m   = (likes_30m + 5*shares_30m) / greatest(impressions_30m, 100)
    completion_30m = play_finish_30m / greatest(play_start_30m, 1)
    skip_30m       = skips_30m / greatest(play_start_30m, 1)

Decision precedence BOOST > REVIEW > RESCUE > NO_ACTION with null-safe flags
(missing dims/thresholds => conservative NO_ACTION)
(ref: src/spark/rt_action_decisioning.py:46-85;
src/trino/rt_video_metrics_serving.sql:106-158).

A pure-Python mirror (`decide_row`) exists for boundary-value unit tests,
mirroring the reference's dual implementation (rt_action_decisioning.py is
the python twin of the serving SQL CASE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C


def velocity_expr(
    likes: Column, shares: Column, impressions: Column
) -> Column:
    return (likes + F.lit(C.VELOCITY_SHARE_WEIGHT) * shares) / F.greatest(
        impressions.cast("double"), F.lit(float(C.VELOCITY_IMPRESSIONS_FLOOR))
    )


def rate_expr(numerator: Column, play_start: Column) -> Column:
    return numerator.cast("double") / F.greatest(
        play_start.cast("double"), F.lit(float(C.RATE_PLAY_START_FLOOR))
    )


def with_derived_metrics(
    df: DataFrame,
    likes: str = "likes_30m",
    shares: str = "shares_30m",
    impressions: str = "impressions_30m",
    play_finish: str = "play_finish_30m",
    play_start: str = "play_start_30m",
    skips: str = "skips_30m",
) -> DataFrame:
    """Append velocity_30m / completion_30m / skip_30m rate columns."""
    return (
        df.withColumn(
            "velocity_30m",
            velocity_expr(F.col(likes), F.col(shares), F.col(impressions)),
        )
        .withColumn("completion_30m", rate_expr(F.col(play_finish), F.col(play_start)))
        .withColumn("skip_30m", rate_expr(F.col(skips), F.col(play_start)))
    )


def with_flags(
    df: DataFrame,
    velocity_p90: Column,
    impressions_p40: Column,
    velocity: str = "velocity_30m",
    impressions: str = "impressions_30m",
    completion: str = "completion_30m",
    skip: str = "skip_30m",
    play_start: str = "play_start_30m",
    min_impressions: float = C.CANDIDATE_MIN_IMPRESSIONS,
    min_completion: float = C.QUALITY_MIN_COMPLETION,
    max_skip: float = C.QUALITY_MAX_SKIP,
    min_play_start: float = C.QUALITY_MIN_PLAY_START,
) -> DataFrame:
    """D1-D3: candidate / quality / under-exposed boolean flags, null-safe FALSE.

    Threshold keywords default to the contract-locked values; tests/fixtures
    at small scale may pass scaled values (both sides of an oracle compare
    must use the same ones).
    """
    candidate = (F.col(velocity) >= velocity_p90) & (
        F.col(impressions) >= F.lit(min_impressions)
    )
    quality = (
        (F.col(completion) >= F.lit(min_completion))
        & (F.col(skip) <= F.lit(max_skip))
        & (F.col(play_start) >= F.lit(min_play_start))
    )
    under_exposed = F.col(impressions) <= impressions_p40
    return (
        df.withColumn("is_candidate", F.coalesce(candidate, F.lit(False)))
        .withColumn("is_quality", F.coalesce(quality, F.lit(False)))
        .withColumn("is_under_exposed", F.coalesce(under_exposed, F.lit(False)))
    )


def with_decision(
    df: DataFrame,
    upload_age_minutes: str = "upload_age_minutes",
    out_col: str = "decision_type",
    max_rescue_age_minutes: float = C.RESCUE_MAX_UPLOAD_AGE_MINUTES,
) -> DataFrame:
    """D4: precedence CASE — BOOST > REVIEW > RESCUE > NO_ACTION.

    RESCUE additionally requires upload_age <= 60 minutes; a NULL upload age
    (missing dim row) conservatively maps to NO_ACTION.
    """
    rescue_age_ok = F.coalesce(
        F.col(upload_age_minutes) <= F.lit(max_rescue_age_minutes),
        F.lit(False),
    )
    decision = (
        F.when(
            F.col("is_candidate") & F.col("is_quality"), F.lit(C.DECISION_BOOST)
        )
        .when(
            F.col("is_candidate") & ~F.col("is_quality"), F.lit(C.DECISION_REVIEW)
        )
        .when(
            F.col("is_under_exposed") & F.col("is_quality") & rescue_age_ok,
            F.lit(C.DECISION_RESCUE),
        )
        .otherwise(F.lit(C.DECISION_NO_ACTION))
    )
    return df.withColumn(out_col, decision)


def suppress_no_action(df: DataFrame, col: str = "decision_type") -> DataFrame:
    """D5: actionable-only persistence."""
    return df.filter(F.col(col) != C.DECISION_NO_ACTION)


def queue_rows(
    df: DataFrame,
    decided_at: str = "window_start",
    col: str = "decision_type",
) -> DataFrame:
    """D6: action-queue row construction — priority/TTL maps, sha256 id.

    action_id = sha256(video_id|window_start|decision_type) fingerprint
    (ref: src/spark/rt_action_queue_producer.py:162-168 uses a sha256 of the
    identity tuple; exact salt differs — ours is content-addressed the same
    way and stable across replays).
    """
    priority = F.when(F.col(col) == C.DECISION_RESCUE, F.lit(1)).when(
        F.col(col) == C.DECISION_REVIEW, F.lit(2)
    ).when(F.col(col) == C.DECISION_BOOST, F.lit(3))
    ttl_min = (
        F.when(F.col(col) == C.DECISION_RESCUE, F.lit(C.ACTION_TTL_MINUTES["RESCUE"]))
        .when(F.col(col) == C.DECISION_REVIEW, F.lit(C.ACTION_TTL_MINUTES["REVIEW"]))
        .when(F.col(col) == C.DECISION_BOOST, F.lit(C.ACTION_TTL_MINUTES["BOOST"]))
    )
    reason = F.array(
        F.concat_ws(
            "_",
            F.lower(F.col(col)),
            F.lit("rule"),
            F.lit(C.RULE_VERSION),
        )
    )
    return df.select(
        F.sha2(
            F.concat_ws(
                "|", F.col("video_id"), F.col(decided_at).cast("string"), F.col(col)
            ),
            256,
        ).alias("action_id"),
        "video_id",
        F.col(decided_at).alias("window_start"),
        F.col(col).alias("decision_type"),
        priority.alias("priority"),
        F.lit(C.ACTION_STATE_PENDING).alias("state"),
        reason.alias("reason_codes"),
        F.col(decided_at).alias("decided_at"),
        (
            F.col(decided_at) + ttl_min * F.expr("INTERVAL 1 MINUTE")
        ).alias("expires_at"),
        F.current_timestamp().alias("created_at"),
        F.current_timestamp().alias("updated_at"),
    )


def validate_queue_rows(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """D7: queue-row validation — (valid, violations) split.

    Checks: required non-null, decision/priority/state domains,
    expires_at > decided_at, non-empty reason_codes.
    """
    # every contract column is null-checked: a NULL priority/decided_at/
    # expires_at/reason_codes would make the later domain predicates NULL
    # (3-valued logic) and silently skip the when() branch
    required = [
        "action_id",
        "video_id",
        "window_start",
        "decision_type",
        "state",
        "priority",
        "decided_at",
        "expires_at",
        "reason_codes",
    ]
    missing = F.concat_ws(
        ",", *[F.when(F.col(c).isNull(), F.lit(c)) for c in required]
    )
    bad = (
        F.when(missing != "", F.concat(F.lit("null_required:"), missing))
        .when(
            ~F.col("decision_type").isin(
                C.DECISION_BOOST, C.DECISION_REVIEW, C.DECISION_RESCUE
            ),
            F.lit("decision_out_of_domain"),
        )
        .when(~F.col("priority").isin(1, 2, 3), F.lit("priority_out_of_domain"))
        .when(~F.col("state").isin(*C.ACTION_STATES), F.lit("state_out_of_domain"))
        .when(
            ~(F.col("expires_at") > F.col("decided_at")), F.lit("ttl_not_positive")
        )
        .when(F.size(F.col("reason_codes")) <= 0, F.lit("empty_reason_codes"))
    )
    annotated = df.withColumn("violation", bad)
    return (
        annotated.filter(F.col("violation").isNull()).drop("violation"),
        annotated.filter(F.col("violation").isNotNull()),
    )


# ---------------------------------------------------------------------------
# Pure-Python mirror (test oracle, reference-style)
# ---------------------------------------------------------------------------

def decide_row(
    velocity_30m: float | None,
    impressions_30m: float | None,
    completion_30m: float | None,
    skip_30m: float | None,
    play_start_30m: float | None,
    upload_age_minutes: float | None,
    velocity_p90: float = C.VELOCITY_P90_THRESHOLD,
    impressions_p40: float = C.IMPRESSIONS_P40_THRESHOLD,
) -> str:
    """Pure-python twin of with_flags + with_decision (boundary tests)."""

    def nz(x: bool | None) -> bool:
        return bool(x) if x is not None else False

    def cmp(a: float | None, op, b: float) -> bool | None:
        if a is None:
            return None
        return op(a, b)

    import operator as _op

    candidate = nz(
        None
        if velocity_30m is None or impressions_30m is None
        else velocity_30m >= velocity_p90 and impressions_30m >= C.CANDIDATE_MIN_IMPRESSIONS
    )
    quality = nz(
        None
        if completion_30m is None or skip_30m is None or play_start_30m is None
        else (
            completion_30m >= C.QUALITY_MIN_COMPLETION
            and skip_30m <= C.QUALITY_MAX_SKIP
            and play_start_30m >= C.QUALITY_MIN_PLAY_START
        )
    )
    under = nz(cmp(impressions_30m, _op.le, impressions_p40))
    age_ok = nz(cmp(upload_age_minutes, _op.le, C.RESCUE_MAX_UPLOAD_AGE_MINUTES))

    if candidate and quality:
        return C.DECISION_BOOST
    if candidate and not quality:
        return C.DECISION_REVIEW
    if under and quality and age_ok:
        return C.DECISION_RESCUE
    return C.DECISION_NO_ACTION
