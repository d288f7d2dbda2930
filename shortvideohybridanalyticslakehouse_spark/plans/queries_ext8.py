"""Extension queries, round 8: grouped statistics computed from EXACT
decimal moment sums (stddev, correlation), z-score outlier detection,
and deterministic mode — each with a DuckDB oracle.

Why not stddev()/corr() builtins: both engines implement them as
incremental float algorithms whose result depends on partition/add
order. Decimal-summed moments (Sx, Sxx, Sxy are exact integers-scaled)
feed ONE final double expression — identical operands on both engines,
bit-identical result. Same trick as the decimal revenue sums, lifted to
second moments. Mode: count per (group, value) then max-count with
min-value tie-break — engines' native mode() leaves ties unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Grouped mean / stddev / correlation from exact moments
# ---------------------------------------------------------------------------

# moments fit decimal(38,*): |price| < 1e6 scale 2 -> price² < 1e12 scale 4;
# 1e7 rows of those sums stay < 1e19 « 1e34.
_SEGMENT_STATS_ORACLE = """
WITH m AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
         sum(CAST(o_totalprice AS DECIMAL(18,2))
             * CAST(o_totalprice AS DECIMAL(18,2))) AS sxx,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sy,
         sum(CAST(c_acctbal AS DECIMAL(18,2))
             * CAST(c_acctbal AS DECIMAL(18,2))) AS syy,
         sum(CAST(o_totalprice AS DECIMAL(18,2))
             * CAST(c_acctbal AS DECIMAL(18,2))) AS sxy
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
SELECT
  c_mktsegment,
  n,
  round(CAST(sx AS DOUBLE) / n, 4) AS mean_price,
  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
             / (n - 1)), 4) AS std_price,
  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        6) AS corr_price_acctbal
FROM m
"""


@register("segment_price_stats", _SEGMENT_STATS_ORACLE)
def q_segment_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order-price mean/stddev and price↔account-balance
    correlation, all derived from exact decimal moment sums (the
    engines' native stddev/corr are add-order-dependent streaming
    algorithms; moment sums are one map-side-combinable aggregation).
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    x = F.col("o_totalprice").cast("decimal(18,2)")
    y = F.col("c_acctbal").cast("decimal(18,2)")
    m = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
            F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "c_mktsegment",
        "n",
        F.round(sx / n, 4).alias("mean_price"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))), 4).alias("std_price"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_price_acctbal"),
    )


# ---------------------------------------------------------------------------
# z-score outlier detection per group
# ---------------------------------------------------------------------------

# Two passes over events, both grouped on event_type: moments, then a
# broadcast of the 5-row stats joined back for the per-row test. At
# 100 TB the stats side is always broadcastable (|groups| rows).
_OUTLIERS_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(value AS DECIMAL(18,6))) AS sx,
         sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx
  FROM events GROUP BY event_type
), stats AS (
  SELECT event_type, n,
         CAST(sx AS DOUBLE) / n AS mu,
         sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
              / (n - 1)) AS sigma
  FROM m
)
SELECT
  e.event_type,
  s.n AS n_events,
  CAST(sum(CASE WHEN abs(CAST(e.value AS DOUBLE) - s.mu) > 3 * s.sigma
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  round(CAST(sum(CASE WHEN abs(CAST(e.value AS DOUBLE) - s.mu) > 3 * s.sigma
                      THEN 1 ELSE 0 END) AS DOUBLE) / s.n, 6) AS outlier_rate
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type, s.n
"""


@register("event_value_outliers", _OUTLIERS_ORACLE)
def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outlier counts per event type. μ and σ come from exact decimal
    moments; the per-row |x−μ| > 3σ test then uses identical double
    operands on both engines, so even boundary rows agree.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    v = F.col("value").cast("decimal(18,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sx"),
        F.sum(v * v).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    stats = m.select(
        "event_type",
        F.col("n"),
        (sx / n).alias("mu"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))).alias("sigma"),
    )
    is_out = (
        F.abs(F.col("value").cast("double") - F.col("mu"))
        > F.lit(3) * F.col("sigma")
    ).cast("bigint")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", F.col("n").alias("n_events"))
        .agg(
            F.sum(is_out).alias("n_outliers"),
            F.round(
                F.sum(is_out).cast("double") / F.col("n_events").cast("double"), 6
            ).alias("outlier_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mode per group
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS cnt
  FROM part GROUP BY p_brand, p_type
), ranked AS (
  SELECT p_brand, p_type, cnt,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY cnt DESC, p_type ASC) AS rn
  FROM counts
)
SELECT p_brand, p_type AS mode_type, cnt AS n_parts
FROM ranked WHERE rn = 1
"""


@register("brand_mode_part_type", _MODE_ORACLE)
def q_brand_mode_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common part type per brand with a pinned tie-break (max count,
    then lexicographic min) — native mode() leaves ties engine-defined.
    Two map-side-combinable aggs + a tiny window; no raw-row window.
    """
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").select("p_brand", "p_type")
    counts = part.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(
        F.col("cnt").desc(), F.col("p_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), F.col("cnt").alias("n_parts"))
    )
