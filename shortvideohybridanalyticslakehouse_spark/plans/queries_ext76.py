"""Extension queries, round 76: grouped OLS — per-brand slope of order
quantity against discount (the price-elasticity proxy every merchandiser
asks for), the GROUPED form of the global regr_slope query
(event_value_regr_slope).

Exactness: discount and quantity route through DECIMAL(18,2) to integer
units (x = discount in PERCENT HUNDREDTHS, so 0.05 -> 5; y = quantity
hundredths), so the five regression sums are exact BIGINTs; slope_micro
= floor(1e6 * (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)) is one IEEE division
per brand (NULL when the brand has no discount variance) and reads as
quantity-hundredths per discount-percent-hundredth. Sums stay in int64
at sf scales (|x| <= 10, |y| <= 5000); DECIMAL(38,0) guards the
cross-products where they could outgrow int64 at 100 TB.

Plan: lineitem joins the broadcastable part dim for the brand key, one
combinable groupBy computes all five sums — a single shuffle on brand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SLOPE_ORACLE = """
WITH pts AS (
  SELECT p.p_brand AS brand,
         CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), sums AS (
  SELECT brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy
  FROM pts GROUP BY 1
)
SELECT brand, n,
  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000
            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) END
    AS slope_micro
FROM sums
"""


@register("discount_quantity_slope_by_brand", _SLOPE_ORACLE)
def q_discount_quantity_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per brand: OLS slope of quantity hundredths on discount percent
    hundredths, exact integer regression sums, floored micro slope,
    NULL on zero discount variance."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pts = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    sums = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
    )
    var = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "brand",
        "n",
        F.when(var == 0, F.lit(None))
        .otherwise(
            F.floor(num.cast("double") * 1000000 / var.cast("double")).cast(
                "bigint"
            )
        )
        .alias("slope_micro"),
    )
