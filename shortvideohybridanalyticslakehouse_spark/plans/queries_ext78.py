"""Extension queries, round 78: duplicate-payment audit — the
double-charge / double-fire detector every finance-adjacent DQ suite
runs: pairs of purchases by the SAME user for the SAME whole-dollar
amount within six hours are flagged as suspected duplicates.

Shape: the self-join blocks on the exact (user_id, whole-dollar) pair —
an equi-join, so candidates are bounded by per-(user, amount-band)
purchase multiplicity, never |purchases|^2 — with the time band and a
strict (ts, event_id) ordering predicate as the residual (each unordered
pair reported once). Cents go through the DECIMAL(18,2) hop
(plans/money.py rationale). Output is the per-user audit rollup plus
exact total counts, integer end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_WINDOW_S = 21600  # 6 hours

_DUP_PAY_ORACLE = f"""
WITH p AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS e,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS dollars
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT a.user_id, a.cents,
         b.e - a.e AS gap_s
  FROM p a JOIN p b
    ON b.user_id = a.user_id AND b.dollars = a.dollars
   AND (a.e < b.e OR (a.e = b.e AND a.event_id < b.event_id))
   AND b.e - a.e <= {_WINDOW_S}
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_suspect_pairs,
       CAST(sum(cents) AS BIGINT) AS suspect_cents,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s
FROM pairs GROUP BY user_id
"""


@register("duplicate_purchase_audit", _DUP_PAY_ORACLE)
def q_duplicate_purchase_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: suspected duplicate purchases (same whole-dollar amount
    within 6 h), pair counts, exposed cents, and the tightest gap."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("e"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias(
            "cents"
        ),
    ).withColumn("dollars", F.floor(F.col("cents") / 100).cast("bigint"))
    a = p.select(
        "user_id",
        "dollars",
        "cents",
        F.col("e").alias("e_a"),
        F.col("event_id").alias("id_a"),
    )
    b = p.select(
        "user_id",
        "dollars",
        F.col("e").alias("e_b"),
        F.col("event_id").alias("id_b"),
    )
    pairs = (
        a.join(b, ["user_id", "dollars"])
        .filter(
            (
                (F.col("e_a") < F.col("e_b"))
                | ((F.col("e_a") == F.col("e_b")) & (F.col("id_a") < F.col("id_b")))
            )
            & (F.col("e_b") - F.col("e_a") <= _WINDOW_S)
        )
        .select("user_id", "cents", (F.col("e_b") - F.col("e_a")).alias("gap_s"))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suspect_pairs"),
        F.sum("cents").cast("bigint").alias("suspect_cents"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
    )
