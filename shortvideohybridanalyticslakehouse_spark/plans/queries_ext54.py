"""Extension queries, round 54: SCD2 dimension build + point-in-time
join — the slowly-changing-dimension pattern every lakehouse warehouse
needs: turn a change stream into validity intervals (valid_from,
valid_to) with TRUE SCD2 semantics (only state CHANGES open a new
version — consecutive duplicates collapse), then join facts against the
version in effect at fact time.

Here the change stream is each user's non-purchase event history (the
user's "current activity state") and the facts are purchase events: for
every purchase, what state was the buyer in at purchase time?

Build: islands via the row_number-difference trick is unnecessary —
a state change is `state != lag(state)`; a running SUM of change flags
numbers the versions, and version intervals are (min ts in version,
lead of that). Point-in-time join: equi on user_id + range residual
(ts >= valid_from AND (ts < valid_to OR open)) — plans as a sort-merge
join on the equi key with the range as a filter condition, NEVER a
cross product. Facts before the first version (or from users with no
state history) surface as 'UNKNOWN', not dropped.

Scale shape (100 TB): two window passes over the change stream, both
partitioned by user_id (one shuffle, reused); the PIT join shuffles on
user_id. Versions-per-user is bounded by that user's event count; no
skew surface beyond genuinely hyperactive users (the same salting story
as every per-user window in this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SCD2_ORACLE = r"""
WITH changes AS (
  SELECT user_id, ts, event_id, event_type AS state
  FROM events WHERE event_type <> 'purchase'
), flagged AS (
  SELECT user_id, ts, event_id, state,
         CASE WHEN state = lag(state) OVER w THEN 0 ELSE 1 END AS chg
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), versioned AS (
  SELECT user_id, ts, state,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged
), scd2 AS (
  SELECT user_id, state, version, min(ts) AS valid_from
  FROM versioned GROUP BY 1, 2, 3
), dim AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM scd2
), facts AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), pit AS (
  SELECT f.user_id, f.ts, f.value, coalesce(d.state, 'UNKNOWN') AS state
  FROM facts f
  LEFT JOIN dim d
    ON d.user_id = f.user_id
   AND f.ts >= d.valid_from
   AND (d.valid_to IS NULL OR f.ts < d.valid_to)
)
SELECT state,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
       CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS value_sum
FROM pit GROUP BY 1
"""


def scd2_bands(changes: DataFrame) -> DataFrame:
    """SCD2 band builder over a change frame (user_id, ts, event_id,
    state): consecutive duplicate states collapse into one version, a
    running change-flag sum numbers versions, LEAD closes intervals and
    the last version per user stays open (valid_to NULL). Returns
    (user_id, state, valid_from, valid_to).

    SHARED by the batch registry query and the streaming band maintainer
    (streaming/scd2.py) — the serving.gold_1min pattern: one plan builder
    so batch and streaming SCD2 cannot drift."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = changes.withColumn(
        "chg",
        F.when(F.col("state") == F.lag("state").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    # version numbering needs a TOTAL order (ties would make the running
    # sum order-dependent across engines): (ts, event_id) is unique
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    versioned = flagged.withColumn("version", F.sum("chg").over(wv))
    scd2 = versioned.groupBy("user_id", "state", "version").agg(
        F.min("ts").alias("valid_from")
    )
    wd = Window.partitionBy("user_id").orderBy("valid_from")
    return scd2.withColumn("valid_to", F.lead("valid_from").over(wd)).select(
        "user_id", "state", "valid_from", "valid_to"
    )


@register("scd2_state_point_in_time", _SCD2_ORACLE)
def q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from a change stream (consecutive duplicate states collapse
    into one version; running change-flag sum numbers versions; LEAD
    closes intervals, the last version stays open) + point-in-time join
    of purchase facts: equi user_id key with the validity range as the
    join residual, facts with no covering version kept as 'UNKNOWN'."""
    ev = load_table(spark, sf_dir, "events")
    changes = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    dim = scd2_bands(changes)
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pit = facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (facts["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
        "left",
    ).select(
        facts["user_id"],
        facts["ts"],
        "value",
        F.coalesce(dim["state"], F.lit("UNKNOWN")).alias("state"),
    )
    return pit.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_buyers"),
        # repo float-determinism convention: exact DECIMAL sum, ONE cast
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    )
