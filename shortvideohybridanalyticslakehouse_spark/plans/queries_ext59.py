"""Extension queries, round 59: sequential-recurrence smoothing and
weighted order statistics.

- event_type_ewma: exponentially weighted moving average of per-minute
  event counts (alpha = 1/8). EWMA is a true sequential recurrence
  (s_t = alpha*x_t + (1-alpha)*s_{t-1}), which no windowed SQL aggregate
  expresses directly; both engines therefore FOLD the same ordered
  series with the same two IEEE-double operations per step
  (Spark `aggregate` HOF over an array_sort'ed collect_list; DuckDB
  `list_reduce` over `list(... ORDER BY minute)`), seeded by the first
  element. Multiplication by 0.875/0.125 (both exactly representable)
  and addition are correctly-rounded deterministic IEEE ops, so the two
  engines produce BIT-IDENTICAL doubles — the value-hash gate holds with
  no rounding fudge. Scale: the heavy events relation reduces to
  per-(type, minute) counts map-side; the folded array is O(minutes per
  type), bounded by the calendar, and the fold itself is a JVM
  whole-stage HOF (no Python). The incremental twin of this recurrence
  is exactly what transformWithState/applyInPandasWithState keeps as
  per-key state in streaming (one double per key).

- brand_weighted_median_price: the size-weighted lower median price per
  brand — smallest price whose cumulative weight reaches half the total
  (2*cum >= total, integer arithmetic, no float thresholds). Prices
  first collapse to one row per (brand, price) (map-side combinable), so
  the per-brand ordered window runs over O(distinct prices per brand)
  rows with parallelism = |brands|; the catalog-scale relation never
  enters a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_EWMA_ORACLE = """
WITH m AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_minutes,
         CAST(sum(x) AS BIGINT) AS total_count,
         list(CAST(x AS DOUBLE) ORDER BY minute) AS xs
  FROM m GROUP BY 1
)
SELECT event_type, n_minutes, total_count,
       list_reduce(
         xs,
         (acc, x) -> acc * CAST(0.875 AS DOUBLE) + x * CAST(0.125 AS DOUBLE)
       ) AS ewma_last
FROM s
"""


@register("event_type_ewma", _EWMA_ORACLE)
def q_event_type_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (alpha = 1/8) of the per-minute count series for each
    event type — the left fold both engines replay operation-for-
    operation, so the doubles match bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).alias("x"))
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("x").alias("total_count"),
        F.array_sort(F.collect_list(F.struct("minute", "x"))).alias("arr"),
    )
    xs = F.transform(F.col("arr"), lambda e: e["x"].cast("double"))
    return s.select(
        "event_type",
        "n_minutes",
        "total_count",
        F.aggregate(
            F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0))),
            F.element_at(xs, 1),
            lambda acc, x: acc * F.lit(0.875) + x * F.lit(0.125),
        ).alias("ewma_last"),
    )


_WMEDIAN_ORACLE = """
WITH g AS (
  SELECT p_brand, p_retailprice AS price,
         CAST(sum(p_size) AS BIGINT) AS w
  FROM part GROUP BY 1, 2
), c AS (
  SELECT p_brand, price, w,
    sum(w) OVER (PARTITION BY p_brand ORDER BY price
                 ROWS UNBOUNDED PRECEDING) AS cum,
    sum(w) OVER (PARTITION BY p_brand) AS total
  FROM g
), r AS (
  SELECT p_brand, price, total,
         row_number() OVER (PARTITION BY p_brand ORDER BY price) AS rn
  FROM c
  WHERE 2 * cum >= total
)
SELECT p_brand,
       CAST(price AS DOUBLE) AS w_median_price,
       CAST(total AS BIGINT) AS total_weight
FROM r WHERE rn = 1
"""


@register("brand_weighted_median_price", _WMEDIAN_ORACLE)
def q_brand_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted lower median retail price per brand: the smallest
    price whose cumulative weight covers half the brand's total weight
    (threshold kept in exact integers)."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy("p_brand", F.col("p_retailprice").alias("price")).agg(
        F.sum("p_size").cast("bigint").alias("w")
    )
    w_ord = (
        Window.partitionBy("p_brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.withColumn("cum", F.sum("w").over(w_ord)).withColumn(
        "total", F.sum("w").over(Window.partitionBy("p_brand"))
    )
    r = c.filter(2 * F.col("cum") >= F.col("total")).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("p_brand").orderBy("price")),
    )
    return r.filter(F.col("rn") == 1).select(
        "p_brand",
        F.col("price").cast("double").alias("w_median_price"),
        F.col("total").cast("bigint").alias("total_weight"),
    )
