"""Extension queries, round 24: Benford first-digit audit (fraud/DQ
forensics) and time-weighted averages (the irregular-series metric that
plain AVG gets wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Benford first-digit distribution audit
# ---------------------------------------------------------------------------

# First significant digit via string head of the integer part — no
# log/pow (libm results can differ across engines in the last ulp; a
# substring cannot). Expected Benford mass P(d) = log10(1 + 1/d) is a
# Python-side constant literal, identical in both plans.
_BENFORD_EXPECTED = {
    d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)
}

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
), counted AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(count(*)) OVER () AS BIGINT) AS total
  FROM digits GROUP BY d
)
SELECT
  d,
  n,
  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed,
  round(CAST(CASE d {' '.join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_EXPECTED.items())} END AS DOUBLE), 6)
    AS expected,
  round(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
        - CAST(CASE d {' '.join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_EXPECTED.items())} END AS DOUBLE)), 6)
    AS abs_dev
FROM counted
"""


@register("benford_first_digit_audit", _BENFORD_ORACLE)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against the
    Benford expectation — the classic fabricated-numbers screen.
    Digit extraction is string-head of the integer part (log10 of the
    value would invite cross-engine libm ulp drift); the tiny 9-row
    result carries observed vs expected mass and deviation.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    counted = orders.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    # O(9)-row frame (one row per leading digit): single partition is the
    # design; non-foldable constant key silences the WindowExec warning.
    w_total = Window.partitionBy(F.col("d") * 0)
    expected = F.create_map(
        *[x for dd, p in _BENFORD_EXPECTED.items() for x in (F.lit(dd), F.lit(p))]
    )[F.col("d")]
    obs = F.col("n").cast("double") / F.sum("n").over(w_total).cast("double")
    return counted.select(
        "d",
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(F.abs(obs - expected), 6).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average value per user (irregular series TWAP)
# ---------------------------------------------------------------------------

# Each observation holds until the next one (step interpolation); its
# weight is that holding interval in EXACT integer microseconds (lead
# over the user's timeline). Plain AVG would let burst periods dominate.
# The weighted sum multiplies value by a BIGINT weight — deterministic
# double arithmetic, same operand order both engines.
_TWAP_ORACLE = """
WITH seq AS (
  SELECT user_id, value,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t_next
  FROM events WHERE value IS NOT NULL
), weighted AS (
  SELECT user_id, value, t_next - t AS w
  FROM seq WHERE t_next IS NOT NULL
)
SELECT
  user_id,
  CAST(count(*) AS BIGINT) AS n_intervals,
  CAST(sum(w) AS BIGINT) AS observed_us,
  round(CAST(sum(CAST(value AS DECIMAL(18,6)) * w) AS DOUBLE)
        / CAST(sum(w) AS DOUBLE), 6) AS twap_value
FROM weighted GROUP BY user_id
"""


@register("user_time_weighted_avg_value", _TWAP_ORACLE)
def q_user_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user: each value holds until
    the user's next event (step interpolation), weighted by the exact
    microsecond interval. One user-partitioned sort provides the lead;
    the rollup is map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts")).alias("t"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    weighted = seq.select(
        "user_id", "value", (F.col("t_next") - F.col("t")).alias("w")
    )
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("w").cast("bigint").alias("observed_us"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("w")).cast(
                "double"
            )
            / F.sum("w").cast("double"),
            6,
        ).alias("twap_value"),
    )
