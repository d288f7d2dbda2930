"""Extension queries, round 56: keyless range join via binning — join
events into derived "high-traffic windows" whose ONLY join predicate is
time containment (operators/rangejoin.py).

Window derivation (deterministic, integer-exact): a minute is HIGH when
its event count exceeds 1.2x the daily average — compared as
`count * n_minutes * 10 > day_total * 12` (pure integers, no float
threshold to disagree on); consecutive high minutes within a day merge
into one window via the island trick (minute index minus row_number is
constant inside a run). Windows deliberately don't cross midnight (the
per-day partitioning is also what keeps the island window distributed).

The join then attributes EVERY event to the window(s) containing it.
There is no shared key — exactly the case where naive Spark falls back
to a nested loop — so the operator bins time at 300 s: intervals
explode into covered bins, events tag their bin, the join is equi on
bin with the exact range as residual. The oracle verifies with a direct
BETWEEN join (DuckDB's IEJoin handles it); the Spark plan is the
scale-out shape.

Scale shape (100 TB): the minute rollup is one partial-agg shuffle;
islands are per-day windows (distributed by date); the range join
shuffles events once on bin keys — candidate pairs are bounded by
events-per-bin x windows-overlapping-that-bin, never |events| x
|windows|. Bin width trades explode factor (span/bin rows per interval)
against residual-filter selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.rangejoin import (
    binned_interval_join,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_HIGH_ORACLE = r"""
WITH m AS (
  SELECT date_trunc('day', ts) AS day, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS day_total,
         CAST(count(*) AS BIGINT) AS n_minutes
  FROM m GROUP BY 1
), high AS (
  SELECT m.day, m.minute, m.c
  FROM m JOIN d USING (day)
  WHERE m.c * d.n_minutes * 10 > d.day_total * 12
), isl AS (
  SELECT day, minute, c,
         CAST(date_diff('second', TIMESTAMP '1970-01-01', minute) AS BIGINT)
           // 60
         - row_number() OVER (PARTITION BY day ORDER BY minute) AS grp
  FROM high
), win AS (
  SELECT min(minute) AS w_start,
         max(minute) + INTERVAL 1 MINUTE AS w_end
  FROM isl GROUP BY day, grp
)
SELECT strftime(w.w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(date_diff('second', w.w_start, w.w_end) AS BIGINT)
         AS window_seconds,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(e.value AS DECIMAL(18, 2))) AS DOUBLE) AS value_sum
FROM win w
JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.w_start, w.w_end
"""


@register("high_traffic_window_rollup", _HIGH_ORACLE)
def q_high_traffic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive per-day high-traffic windows (integer-exact threshold,
    island-merged) and attribute every event to its containing window
    through the binned range join — equi on 300 s bins + exact residual,
    never a nested loop over events x windows."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("minute", F.col("ts")).alias("minute"),
    ).agg(F.count(F.lit(1)).alias("c"))
    d = m.groupBy("day").agg(
        F.sum("c").alias("day_total"), F.count(F.lit(1)).alias("n_minutes")
    )
    high = m.join(F.broadcast(d), "day").where(
        F.col("c") * F.col("n_minutes") * 10 > F.col("day_total") * 12
    )
    wd = Window.partitionBy("day").orderBy("minute")
    isl = high.withColumn(
        "grp",
        F.expr("CAST(minute AS LONG) DIV 60") - F.row_number().over(wd),
    )
    win = isl.groupBy("day", "grp").agg(
        F.min("minute").alias("w_start"),
        (F.max("minute") + F.expr("INTERVAL 1 MINUTE")).alias("w_end"),
    ).drop("day", "grp")
    joined = binned_interval_join(
        ev, "ts", F.broadcast(win), "w_start", "w_end", bin_seconds=300
    )
    return joined.groupBy("w_start", "w_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    ).select(
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        (F.col("w_end").cast("long") - F.col("w_start").cast("long")).alias(
            "window_seconds"
        ),
        "n_events",
        "n_users",
        "value_sum",
    )
