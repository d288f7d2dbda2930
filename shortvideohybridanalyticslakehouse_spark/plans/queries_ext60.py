"""Extension queries, round 60: interval-union coverage and first-order
sequence transitions — the remaining classic per-user temporal analytics.

- interval_union_coverage: every event opens a 10-minute attention
  window [ts, ts+10min); overlapping windows must count covered time
  ONCE (the measure of the union of intervals, not the sum of lengths).
  Gap-and-island with an exclusive prefix max of interval ends: a row
  starts a new island iff its start >= max(all earlier ends) (half-open
  intervals: touching endpoints merge nothing), island id is the running
  sum of the flags, and each island contributes max(end)-min(start)
  seconds. All windows partition by user_id — frames are O(events per
  user), parallelism is O(users), and arithmetic stays in integer epoch
  seconds (no float drift). At 100 TB this is one keyed shuffle; no
  global order exists anywhere.

- event_transition_matrix: the first-order Markov transition counts and
  probabilities over each user's event-type sequence (LAG per user in
  (ts, event_id) order, then one map-side-combinable groupBy on the
  (prev, next) pair). p = n / row_total computed as BIGINT/BIGINT ->
  DOUBLE in both engines — one correctly-rounded IEEE division, so
  hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_WINDOW_S = 600  # the 10-minute attention window each event opens

_UNION_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {_WINDOW_S} AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NULL
         OR s >= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM iv
), numbered AS (
  SELECT *, sum(new_island) OVER (
    PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island,
         max(e) - min(s) AS len_s
  FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(len_s) AS BIGINT) AS covered_seconds
FROM islands GROUP BY 1
"""


@register("interval_union_coverage", _UNION_ORACLE)
def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: number of merged activity islands and total seconds
    covered by the union of the 10-minute windows their events open."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + _WINDOW_S).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") >= F.col("prev_max_e")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.withColumn("island", F.sum("new_island").over(w_run))
    islands = numbered.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_s")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len_s").cast("bigint").alias("covered_seconds"),
    )


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM pairs
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: counts plus row-normalized probabilities (one IEEE
    division on exact integer counts)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(row_tot).cast("double")
        ).alias("p"),
    )
