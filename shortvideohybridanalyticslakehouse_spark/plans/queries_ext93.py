"""Extension queries, round 93: product-analytics closers — the three
remaining "every growth dashboard has this" reports.

- new_vs_returning_daily: each day's active users split into first-ever
  day vs returning (min-ts per user, one combinable agg + one join).
- purchase_interval_quartiles: purchase-cadence p25/p50/p75 per
  purchase-frequency band, computed EXACTLY by the ext75 idiom —
  group gaps to (band, gap_seconds, n) first, so the cumulative
  threshold runs over the tiny distinct-value frame, partitioned by
  band (never a global or per-row sort).
- weekly_event_growth: week-over-week percent change per event type via
  LAG over per-type weekly counts; growth in floored micro units of
  exact integer counts (NULL on the first week — no fake zeros).

Day/week keys are STRINGS (the cross-engine DATE canon idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_NEW_RET_ORACLE = """
WITH firsts AS (
  SELECT user_id, strftime(min(date_trunc('day', ts)), '%Y-%m-%d') AS d0
  FROM events GROUP BY 1
), daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id
  FROM events GROUP BY 1, 2
)
SELECT d.day,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(count_if(f.d0 = d.day) AS BIGINT) AS new_users,
       CAST(count_if(f.d0 <> d.day) AS BIGINT) AS returning_users
FROM daily d JOIN firsts f USING (user_id)
GROUP BY 1
"""


@register("new_vs_returning_daily", _NEW_RET_ORACLE)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users decomposed into first-ever-day vs returning."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_format(F.min(F.date_trunc("day", F.col("ts"))), "yyyy-MM-dd")
        .alias("d0")
    )
    daily = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct()
    return (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.when(F.col("d0") == F.col("day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("d0") != F.col("day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


_CADENCE_ORACLE = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), gaps AS (
  SELECT user_id,
         CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), user_n AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch FROM p GROUP BY 1
), banded AS (
  SELECT CASE WHEN u.n_purch >= 8 THEN '8+'
              WHEN u.n_purch >= 4 THEN '4-7'
              ELSE '2-3' END AS band,
         g.gap_s
  FROM gaps g JOIN user_n u USING (user_id)
  WHERE g.gap_s IS NOT NULL
), vc AS (
  SELECT band, gap_s, CAST(count(*) AS BIGINT) AS n FROM banded
  GROUP BY 1, 2
), cum AS (
  SELECT band, gap_s,
         sum(n) OVER (PARTITION BY band ORDER BY gap_s
                      ROWS UNBOUNDED PRECEDING) AS c,
         sum(n) OVER (PARTITION BY band) AS tot
  FROM vc
)
SELECT band,
       CAST(max(tot) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN 4 * c >= tot THEN gap_s END) AS BIGINT) AS p25_s,
       CAST(min(CASE WHEN 2 * c >= tot THEN gap_s END) AS BIGINT) AS p50_s,
       CAST(min(CASE WHEN 4 * c >= 3 * tot THEN gap_s END) AS BIGINT) AS p75_s
FROM cum GROUP BY 1
"""


@register("purchase_interval_quartiles", _CADENCE_ORACLE)
def q_purchase_interval_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact purchase-cadence quartiles per purchase-frequency band via
    the cumulative-threshold idiom over the grouped distinct-gap frame."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = p.select(
        "user_id",
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    user_n = p.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_purch"))
    banded = gaps.join(user_n, "user_id").select(
        F.when(F.col("n_purch") >= 8, "8+")
        .when(F.col("n_purch") >= 4, "4-7")
        .otherwise("2-3")
        .alias("band"),
        "gap_s",
    )
    vc = banded.groupBy("band", "gap_s").agg(F.count(F.lit(1)).alias("n"))
    wc = (
        Window.partitionBy("band")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.select(
        "band",
        "gap_s",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(Window.partitionBy("band")).alias("tot"),
    )
    return cum.groupBy("band").agg(
        F.max("tot").cast("bigint").alias("n_gaps"),
        F.min(F.when(4 * F.col("c") >= F.col("tot"), F.col("gap_s")))
        .cast("bigint")
        .alias("p25_s"),
        F.min(F.when(2 * F.col("c") >= F.col("tot"), F.col("gap_s")))
        .cast("bigint")
        .alias("p50_s"),
        F.min(F.when(4 * F.col("c") >= 3 * F.col("tot"), F.col("gap_s")))
        .cast("bigint")
        .alias("p75_s"),
    )


_WOW_ORACLE = """
WITH wk AS (
  SELECT event_type,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, week, n,
       lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
       CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY week)
                 IS NOT NULL
            THEN CAST(FLOOR(1000000.0
                 * (n - lag(n) OVER (PARTITION BY event_type ORDER BY week))
                 / lag(n) OVER (PARTITION BY event_type ORDER BY week))
                 AS BIGINT)
       END AS growth_micro
FROM wk
"""


@register("weekly_event_growth", _WOW_ORACLE)
def q_weekly_event_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change per event type (floored micro units
    of exact weekly counts; NULL first week)."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
        .alias("week"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return wk.select(
        "event_type",
        "week",
        "n",
        prev.alias("prev_n"),
        F.when(
            prev.isNotNull(),
            F.floor(
                F.lit(1_000_000.0) * (F.col("n") - prev) / prev
            ).cast("bigint"),
        ).alias("growth_micro"),
    )
