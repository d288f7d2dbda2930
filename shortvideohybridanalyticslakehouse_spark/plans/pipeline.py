"""Flagship pipeline over the driver's fixture tables (TESTDATA.md §B).

This is the reference's end-to-end serving query (SURVEY.md §7.2) re-keyed to
the fixture `events` table: validate/split -> 1-minute tumbling conditional
aggregation -> per-key rolling 30-minute RANGE sums -> dimension join +
cross-joined quantile thresholds -> null-safe flags -> 4-way decision CASE.

Event-type mapping (fixture -> reference metric):
    view -> impressions, click -> play_start, purchase -> play_finish,
    signup -> likes/shares blend, error -> skips.

Scaled decision knobs (fixture data is ~50 events/user/month vs the
reference's 120 events/sec firehose): floors shrink proportionally; the
FORMULA SHAPES are the contract-locked ones (operators/decision.py).

Determinism-for-oracle notes: every derived double is computed from exact
integer/decimal aggregates, so Spark and DuckDB produce bit-identical
values; quantile thresholds are rounded to 6 decimals on both sides before
use (interpolation formulas may differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.aggregate import tumbling_window_agg
from shortvideohybridanalyticslakehouse_spark.operators.decision import (
    with_decision,
    with_flags,
)
from shortvideohybridanalyticslakehouse_spark.operators.rolling import rolling_range_sums
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# Scaled flagship knobs (oracle SQL in __spark_entry__ must mirror these).
FLAGSHIP_MIN_IMPRESSIONS = 2.0
FLAGSHIP_MIN_COMPLETION = 0.25
FLAGSHIP_MAX_SKIP = 0.75
FLAGSHIP_MIN_PLAY_START = 1.0
FLAGSHIP_MAX_AGE_MINUTES = 7 * 24 * 60.0  # "young" = first seen within 7 days

# One persisted `rolled` view per (session, sf_dir) — see decision_context.
_ROLLED_CACHE: dict[tuple, DataFrame] = {}


def events_1min(
    spark: SparkSession, sf_dir: str, with_min_ts: bool = False
) -> DataFrame:
    """A1/A2: 1-minute tumbling conditional-count aggregation per user.

    NULL timestamps are filtered EXPLICITLY: Spark's window() drops them
    silently while SQL GROUP BY date_trunc keeps a NULL group — the filter
    makes both engines (and both readings of the code) agree.

    ``with_min_ts`` appends an internal ``_min_ts`` column (per-group
    min(ts)) so the flagship can derive the per-user first-seen dimension
    from this 10k-row aggregate instead of a third raw-events scan:
    min-over-windows of per-window mins == exact global min(ts).
    """
    ev = load_table(
        spark, sf_dir, "events", ensure_parallelism=True
    ).filter(F.col("ts").isNotNull())
    t = F.col("event_type")
    agg = tumbling_window_agg(
        ev,
        ts_col="ts",
        key_cols=["user_id"],
        window_duration="1 minute",
        count_conditions={
            "impressions": t == "view",
            "play_start": t == "click",
            "play_finish": t == "purchase",
            "likes": t == "signup",
            "skips": t == "error",
        },
        sum_exprs={
            # exact decimal sum -> double: bit-identical across engines
            "value_sum": F.col("value").cast("decimal(18,2)"),
        },
        extra_aggs={"_min_ts": F.min(F.col("ts"))} if with_min_ts else None,
    ).withColumn("value_sum", F.col("value_sum").cast("double"))
    return agg


def rolling_30m(
    spark: SparkSession, sf_dir: str, agg: DataFrame | None = None
) -> DataFrame:
    """W1: trailing 30-minute RANGE-frame sums over the 1-minute aggregate."""
    if agg is None:
        agg = events_1min(spark, sf_dir)
    agg = agg.withColumn(
        "value_dec", F.col("value_sum").cast("decimal(18,2)")
    )
    rolled = rolling_range_sums(
        agg,
        partition_cols=["user_id"],
        ts_col="window_start",
        sum_cols=["impressions", "play_start", "play_finish", "likes", "skips", "value_dec"],
        minutes=30,
    )
    return rolled.withColumn(
        "value_30m", F.col("value_dec_30m").cast("double")
    ).drop("value_dec", "value_dec_30m")


def user_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension analog: per-user first-seen timestamp (J1 build side).

    Tiny output (one row per user) — explicitly broadcast at join time.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))


def decision_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: rolling metrics + dim join + thresholds + decision CASE.

    Plan shape (round-2 audit): ONE events scan feeds everything. The
    1-min aggregate carries an internal per-group min(ts) so the user
    dimension (first_seen) derives from the 10k-row aggregate instead of
    a second raw scan, and the quantile thresholds are collected as two
    scalars and inlined as literals — the cross-join of a 1-row aggregate
    of the same subtree re-executed the whole scan+agg+window chain
    (Spark plans common subtrees independently; no reuse materialized).
    The reference's architecture makes the same move: thresholds are a
    PUBLISHED 2-row table (rt_rule_quantile_baselines), not a correlated
    recompute.
    """
    agg = events_1min(spark, sf_dir, with_min_ts=True)
    rolled = rolling_30m(spark, sf_dir, agg=agg)

    # Derived metrics — contract formula shapes over exact int inputs.
    rolled = (
        rolled.withColumn(
            "velocity_30m",
            (F.col("likes_30m") + F.lit(5) * F.col("play_finish_30m"))
            / F.greatest(F.col("impressions_30m"), F.lit(100)).cast("double"),
        )
        .withColumn(
            "completion_30m",
            F.col("play_finish_30m")
            / F.greatest(F.col("play_start_30m"), F.lit(1)).cast("double"),
        )
        .withColumn(
            "skip_30m",
            F.col("skips_30m")
            / F.greatest(F.col("play_start_30m"), F.lit(1)).cast("double"),
        )
    )

    # The threshold collect below materializes `rolled`; caching it means
    # the main job reads the 10k-row cached view instead of re-running
    # scan -> agg -> window (the reference materializes its gold fact for
    # exactly this reason). Bounded: at most ONE cached copy per
    # (session, sf_dir) — a repeat invocation unpersists the previous
    # generation first, so long-lived sessions don't accumulate storage.
    cache_key = (spark, sf_dir)
    stale = _ROLLED_CACHE.pop(cache_key, None)
    if stale is not None:
        stale.unpersist(blocking=False)
    rolled = rolled.persist()
    _ROLLED_CACHE[cache_key] = rolled

    # J2/J3 analog: exact-quantile thresholds, collected as two scalars
    # (one tiny job over the rolled view) and inlined as literals — the
    # published-baseline pattern; identical values to the cross-join form.
    th = rolled.agg(
        F.round(F.expr("percentile(velocity_30m, 0.9)"), 6).alias("velocity_p90"),
        F.round(F.expr("percentile(impressions_30m, 0.4)"), 6).alias("impressions_p40"),
    ).first()
    ctx = rolled.withColumn(
        "velocity_p90", F.lit(th["velocity_p90"]).cast("double")
    ).withColumn(
        "impressions_p40", F.lit(th["impressions_p40"]).cast("double")
    )

    # J1 analog without the join: first_seen = unbounded min over the
    # user's partition (min of per-window mins == exact min(ts)). The
    # window reuses the SAME user_id exchange + sort the rolling frame
    # already paid for — no dim branch, no second scan, no join.
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id")
    ctx = ctx.withColumn(
        "first_seen", F.min("_min_ts").over(w_user)
    ).withColumn(
        "age_minutes",
        (
            F.col("window_start").cast("long") - F.col("first_seen").cast("long")
        ).cast("double")
        / F.lit(60.0),
    ).drop("_min_ts")

    ctx = with_flags(
        ctx,
        velocity_p90=F.col("velocity_p90"),
        impressions_p40=F.col("impressions_p40"),
        min_impressions=FLAGSHIP_MIN_IMPRESSIONS,
        min_completion=FLAGSHIP_MIN_COMPLETION,
        max_skip=FLAGSHIP_MAX_SKIP,
        min_play_start=FLAGSHIP_MIN_PLAY_START,
    )
    ctx = with_decision(
        ctx,
        upload_age_minutes="age_minutes",
        max_rescue_age_minutes=FLAGSHIP_MAX_AGE_MINUTES,
    )
    return ctx.select(
        "user_id",
        "window_start",
        "impressions_30m",
        "play_start_30m",
        "play_finish_30m",
        "likes_30m",
        "skips_30m",
        "value_30m",
        "velocity_30m",
        "completion_30m",
        "skip_30m",
        "is_candidate",
        "is_quality",
        "is_under_exposed",
        "decision_type",
    )
