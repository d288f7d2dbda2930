"""Reference-shaped serving layer: gold 1-min fact -> rolling 30-min metrics
view -> decision context view (J1/J2/J3, W1, D1-D4) + quantile baselines.

This is the Spark-SQL re-expression of the reference's two Trino views
(src/trino/rt_video_metrics_serving.sql:8-158) and baseline publisher
(src/spark/rt_rule_quantile_baselines_*.py) — one engine instead of two.

Scale notes: the rolling view shuffles once on video_id (input is the 1-min
gold fact, so partitions are bounded by retention minutes); dims and the
1-row threshold set are broadcast; decisions are pure projections. Nothing
here is materialized — read-time compute over the gold fact, like the
reference ("velocity_score removed from physical schema").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
    exact_percentiles,
    tumbling_window_agg,
)
from shortvideohybridanalyticslakehouse_spark.operators.decision import (
    with_decision,
    with_derived_metrics,
    with_flags,
)
from shortvideohybridanalyticslakehouse_spark.operators.dedup import latest_per_key
from shortvideohybridanalyticslakehouse_spark.operators.rolling import rolling_range_sums

GOLD_METRICS = ("impressions", "play_start", "play_finish", "likes", "shares", "skips")


def gold_1min(valid_events: DataFrame) -> DataFrame:
    """A1/A2/T2/T3 batch twin: 1-minute tumbling agg at video grain.

    ``valid_events``: output of the validate/split path (typed columns
    event_id/event_timestamp/video_id/event_type/watch_time_ms).
    """
    return tumbling_window_agg(
        valid_events,
        ts_col="event_timestamp",
        key_cols=["video_id"],
        window_duration=C.TUMBLING_WINDOW,
        count_conditions=gold_count_conditions(),
        sum_exprs={"watch_time_sum_ms": F.col("watch_time_ms")},
        dedup_col="event_id",
        with_processed_at=True,
    )


def gold_count_conditions() -> dict[str, Column]:
    """The contract-locked metric -> event-type conditional counts, shared
    by the batch (gold_1min) and streaming (jobs.py) gold aggregations so
    the two plans can never drift apart."""
    t = F.col("event_type")
    return {m: t == _etype(m) for m in GOLD_METRICS}


def _etype(metric: str) -> str:
    return {
        "impressions": "impression",
        "play_start": "play_start",
        "play_finish": "play_finish",
        "likes": "like",
        "shares": "share",
        "skips": "skip",
    }[metric]


def dim_videos(valid_cdc: DataFrame) -> DataFrame:
    """W2/J6: Type-1 current snapshot — latest CDC record per video."""
    winners = latest_per_key(valid_cdc, ["video_id"], ["ts_ms", "source_offset"])
    return winners.select(
        "video_id",
        "category",
        "region",
        "upload_time",
        "status",
        F.current_timestamp().alias("updated_at"),
        F.col("ts_ms").alias("source_ts_ms"),
    )


def rolling_metrics_view(gold: DataFrame) -> DataFrame:
    """W1: v_rt_video_metrics_30m_1m — trailing 30-min sums + derived rates."""
    rolled = rolling_range_sums(
        gold,
        partition_cols=["video_id"],
        ts_col="window_start",
        sum_cols=list(GOLD_METRICS) + ["watch_time_sum_ms"],
        minutes=C.ROLLING_WINDOW_MINUTES,
        max_cols=["processed_at"],
    )
    return with_derived_metrics(rolled)


def compute_quantile_baselines(
    metrics: DataFrame, rule_version: str = C.RULE_VERSION, approx: bool = False
) -> DataFrame:
    """A11: live p90(velocity)/p40(impressions) baseline rows.

    The reference publishes these offline (T+1) as governed seed rows; the
    Spark-native upgrade computes them in-engine. ``approx=True`` switches
    to the mergeable percentile_approx sketch for corpus-scale input.
    """
    v = exact_percentiles(metrics, "velocity_30m", [0.9]).select(
        F.lit(rule_version).alias("rule_version"),
        F.lit("velocity_30m").alias("metric_name"),
        F.lit(90).alias("percentile"),
        F.col("p90").alias("threshold_value"),
    )
    i = exact_percentiles(
        metrics.withColumn(
            "impressions_30m_d", F.col("impressions_30m").cast("double")
        ),
        "impressions_30m_d",
        [0.4],
    ).select(
        F.lit(rule_version).alias("rule_version"),
        F.lit("impressions_30m").alias("metric_name"),
        F.lit(40).alias("percentile"),
        F.col("p40").alias("threshold_value"),
    )
    sample = metrics.agg(F.count(F.lit(1)).alias("sample_size"))
    return (
        v.unionByName(i)
        .crossJoin(F.broadcast(sample))
        .withColumn("is_fallback", F.lit(False))
        .withColumn("computed_at", F.current_timestamp())
    )


def pivot_thresholds(baselines: DataFrame) -> DataFrame:
    """J3 analog: conditional-MAX pivot to one row (velocity_p90, impressions_p40)."""
    return baselines.agg(
        F.max(
            F.when(
                (F.col("metric_name") == "velocity_30m") & (F.col("percentile") == 90),
                F.col("threshold_value"),
            )
        ).alias("velocity_p90"),
        F.max(
            F.when(
                (F.col("metric_name") == "impressions_30m")
                & (F.col("percentile") == 40),
                F.col("threshold_value"),
            )
        ).alias("impressions_p40"),
    )


def decision_context_view(
    metrics: DataFrame, dims: DataFrame, thresholds: DataFrame
) -> DataFrame:
    """v_rt_video_decision_context_30m_1m: J1 + J2 + D1-D4.

    Grain guard: left join on video_id must not amplify rows (dims is
    latest-per-key, unique) — verified by verifiers.grain_unique.
    """
    ctx = metrics.join(
        F.broadcast(dims.select("video_id", "category", "region", "upload_time", "status")),
        "video_id",
        "left",
    ).crossJoin(F.broadcast(thresholds))
    ctx = ctx.withColumn(
        "upload_age_minutes",
        (
            F.col("window_start").cast("long") - F.col("upload_time").cast("long")
        ).cast("double")
        / F.lit(60.0),
    )
    ctx = with_flags(
        ctx,
        velocity_p90=F.col("velocity_p90"),
        impressions_p40=F.col("impressions_p40"),
    )
    return with_decision(ctx, out_col="decision_type_preview")


def build_all(
    valid_events: DataFrame,
    valid_cdc: DataFrame,
    baselines: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Wire the full reference pipeline; returns every layer by name."""
    gold = gold_1min(valid_events)
    dims = dim_videos(valid_cdc)
    metrics = rolling_metrics_view(gold)
    if baselines is None:
        baselines = compute_quantile_baselines(metrics)
    thresholds = pivot_thresholds(baselines)
    context = decision_context_view(metrics, dims, thresholds)
    return {
        "gold_1min": gold,
        "dim_videos": dims,
        "metrics_30m": metrics,
        "baselines": baselines,
        "thresholds": thresholds,
        "decision_context": context,
    }


def register_views(spark: SparkSession, layers: dict[str, DataFrame]) -> None:
    """Expose the semantic layer to Spark SQL (BI/acceptance pack surface)."""
    layers["metrics_30m"].createOrReplaceTempView("v_rt_video_metrics_30m_1m")
    layers["decision_context"].createOrReplaceTempView(
        "v_rt_video_decision_context_30m_1m"
    )
    layers["gold_1min"].createOrReplaceTempView("rt_video_stats_1min")
    layers["dim_videos"].createOrReplaceTempView("dim_videos")
