"""Anomaly detection over the event stream (round-4): CUSUM change-point
and trailing-window z-score outliers — the monitoring queries an
operations team runs on the same 1-minute windows the serving layer
publishes.

Exactness design: both statistics are reduced to INTEGER cross-
multiplications so no floating-point accumulation order can diverge
between engines —

  CUSUM_k = sum_{i<=k}(x_i - S/n)  ->  n*CUSUM_k = n*P_k - k*S   (exact)
  z_k^2 > t^2  over a trailing frame of m points with sums S, Q:
      (m*x - S)^2 > t^2 * (m*Q - S^2)                             (exact)

(P_k = ordered prefix sum; all terms BIGINT products of BIGINT counts.)

Plan shape: one 1-minute pre-aggregation of events (map-side combinable),
then per-type ordered windows over O(minutes) rows — the window partition
key is event_type, so parallelism = |types| on a tiny relation; the heavy
relation (raw events) never enters a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def _minute_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_trunc("minute", F.col("ts")).alias("minute"),
    ).agg(F.count(F.lit(1)).alias("x"))


_CUSUM_ORACLE = """
WITH m AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, minute, x,
    SUM(x) OVER (PARTITION BY event_type ORDER BY minute
                 ROWS UNBOUNDED PRECEDING) AS pk,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY minute) AS k,
    SUM(x) OVER (PARTITION BY event_type) AS stot,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM m
), c AS (
  SELECT event_type, minute, x, n,
         CAST(n AS BIGINT) * pk - CAST(k AS BIGINT) * stot AS n_cusum
  FROM s
), r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type
      ORDER BY ABS(n_cusum) DESC, minute ASC) AS rn
  FROM c
)
SELECT event_type, strftime(minute, '%Y-%m-%d %H:%M:%S') AS change_minute,
       x AS minute_count, n AS n_minutes, n_cusum
FROM r WHERE rn = 1
"""


@register("events_cusum_changepoint", _CUSUM_ORACLE)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type, the minute where the cumulative deviation from the
    series mean peaks — the classic CUSUM change-point estimate, computed
    with the exact integer form n*CUSUM_k = n*P_k - k*S."""
    m = _minute_counts(spark, sf_dir)
    w_ord = Window.partitionBy("event_type").orderBy("minute")
    w_all = Window.partitionBy("event_type")
    s = (
        m.withColumn("pk", F.sum("x").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", F.row_number().over(w_ord))
        .withColumn("stot", F.sum("x").over(w_all))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    c = s.withColumn(
        "n_cusum",
        F.col("n").cast("bigint") * F.col("pk")
        - F.col("k").cast("bigint") * F.col("stot"),
    )
    r = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("n_cusum")).desc(), F.col("minute").asc()
            )
        ),
    )
    return r.filter(F.col("rn") == 1).select(
        "event_type",
        F.date_format("minute", "yyyy-MM-dd HH:mm:ss").alias("change_minute"),
        F.col("x").alias("minute_count"),
        F.col("n").alias("n_minutes"),
        "n_cusum",
    )


_ZSCORE_ORACLE = """
WITH m AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, minute, x,
    SUM(x)   OVER w AS s,
    SUM(x*x) OVER w AS q,
    COUNT(*) OVER w AS m_n
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY minute
               ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(minute, '%Y-%m-%d %H:%M:%S') AS minute,
       x AS minute_count, m_n AS trailing_n,
       CAST(m_n * x - s AS BIGINT) AS dev_num
FROM t
WHERE m_n >= 10
  AND (m_n * x - s) * (m_n * x - s) > 9 * (m_n * q - s * s)
"""


@register("events_zscore_outlier_minutes", _ZSCORE_ORACLE)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutes whose count sits more than 3 trailing-window standard
    deviations from the trailing 30-minute mean (z^2 > 9 via the exact
    integer cross-multiplication (m*x - S)^2 > 9*(m*Q - S^2); frames with
    fewer than 10 prior points are skipped as unstable)."""
    m = _minute_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(-30, -1)
    )
    t = (
        m.withColumn("s", F.sum("x").over(w))
        .withColumn("q", F.sum(F.col("x") * F.col("x")).over(w))
        .withColumn("m_n", F.count(F.lit(1)).over(w))
    )
    dev = F.col("m_n") * F.col("x") - F.col("s")
    var_n = F.col("m_n") * F.col("q") - F.col("s") * F.col("s")
    return (
        t.filter((F.col("m_n") >= 10) & (dev * dev > F.lit(9) * var_n))
        .select(
            "event_type",
            F.date_format("minute", "yyyy-MM-dd HH:mm:ss").alias("minute"),
            F.col("x").alias("minute_count"),
            F.col("m_n").alias("trailing_n"),
            dev.cast("bigint").alias("dev_num"),
        )
    )
