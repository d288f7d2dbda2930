"""Extension queries, round 119: isotonic regression of event value on
hour of day — the minimax (max-min) closed form of the PAVA fit
(Barlow et al. 1972), a constrained-regression family the engine didn't
have yet.

The isotonic fit at position i over points y_1..y_n is EXACTLY

    fit_i = max over j <= i of ( min over k >= i of avg(y_j..y_k) )

(the projection onto the monotone cone — the same unique solution PAVA
produces by pooling adjacent violators). With n = 24 hour-of-day
positions the minimax is a bounded O(n^3) relational computation:
prefix sums give every segment average in O(1), one bounded join takes
the inner min, another the outer max.

Determinism contract: y_i is hour i's mean event value from exact
integer cents (DECIMAL(18,2) hop, plans/money.py); segment averages are
single divisions of exact integer (cents, count) pairs, so both engines
produce bit-identical doubles (the ext9 "ratios are identical double
divisions" rule), and min/max over identical doubles cannot drift.
Output rounds once at the end.

Plan shape for 100 TB: the ONLY O(events) stage is the map-side
combinable groupBy(hour-of-day) to 24 (cents, count) rows; the n^3
minimax runs on a broadcast 24-row frame (24^3 = 13.8k comparisons,
constant). Position count — never event count — bounds the regression
arithmetic, which is how an isotonic calibration step (e.g. calibrating
a ranking model's scores, Zadrozny & Elkan 2002) runs at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_ISO_ORACLE = """
WITH hourly AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), pre AS (
  SELECT hod, cents, n,
         sum(cents) OVER (ORDER BY hod) AS ccents,
         sum(n) OVER (ORDER BY hod) AS cn
  FROM hourly
), seg AS (
  -- avg over positions j..k (inclusive), exact ints divided once
  SELECT j.hod AS j, k.hod AS k,
         CAST(k.ccents - j.ccents + j.cents AS DOUBLE)
           / CAST(k.cn - j.cn + j.n AS DOUBLE) AS seg_avg
  FROM pre j JOIN pre k ON j.hod <= k.hod
), inner_min AS (
  -- for each (i, j<=i): min over k>=i of avg(j..k)
  SELECT i.hod AS i, s.j, min(s.seg_avg) AS mn
  FROM pre i JOIN seg s ON s.j <= i.hod AND s.k >= i.hod
  GROUP BY 1, 2
), fit AS (
  SELECT i, max(mn) AS iso_fit FROM inner_min GROUP BY 1
)
SELECT h.hod, h.n,
       round(CAST(h.cents AS DOUBLE) / CAST(h.n AS DOUBLE) / 100, 6)
         AS raw_mean,
       round(f.iso_fit / 100, 6) AS iso_fit
FROM hourly h JOIN fit f ON f.i = h.hod
"""


@register("isotonic_hourly_value_fit", _ISO_ORACLE)
def q_isotonic_hourly_value_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of mean event value
    on hour of day via the exact max-min closed form: per hour, the raw
    mean and the fitted value. Oracle replays the identical minimax over
    identical integer prefix sums."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hod")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # bounded 24-row frame: prefix sums via a self-join (no single-
    # partition WindowExec; the ranks.py bounded-frame rule)
    a = hourly.select(
        F.col("hod").alias("h2"),
        F.col("cents").alias("c2"),
        F.col("n").alias("n2"),
    )
    pre = (
        hourly.join(F.broadcast(a), F.col("h2") <= F.col("hod"))
        .groupBy("hod", "cents", "n")
        .agg(
            F.sum("c2").cast("bigint").alias("ccents"),
            F.sum("n2").cast("bigint").alias("cn"),
        )
    )
    pj = pre.select(
        F.col("hod").alias("j"),
        F.col("cents").alias("j_cents"),
        F.col("n").alias("j_n"),
        F.col("ccents").alias("j_ccents"),
        F.col("cn").alias("j_cn"),
    )
    pk = pre.select(
        F.col("hod").alias("k"),
        F.col("ccents").alias("k_ccents"),
        F.col("cn").alias("k_cn"),
    )
    seg = pj.join(F.broadcast(pk), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("k_ccents") - F.col("j_ccents") + F.col("j_cents")).cast(
                "double"
            )
            / (F.col("k_cn") - F.col("j_cn") + F.col("j_n")).cast("double")
        ).alias("seg_avg"),
    )
    pi = pre.select(F.col("hod").alias("i"))
    inner_min = (
        pi.join(
            F.broadcast(seg),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("seg_avg").alias("mn"))
    )
    fit = inner_min.groupBy("i").agg(F.max("mn").alias("iso_fit"))
    return (
        hourly.join(F.broadcast(fit), F.col("i") == F.col("hod"))
        .select(
            "hod",
            "n",
            F.round(
                F.col("cents").cast("double") / F.col("n").cast("double") / 100,
                6,
            ).alias("raw_mean"),
            F.round(F.col("iso_fit") / 100, 6).alias("iso_fit"),
        )
    )
