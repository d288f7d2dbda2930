"""Extension queries, round 64: hypothesis-testing analytics — the
experiment-analysis pair (A/B two-proportion z-test, chi-square
independence audit) every growth/analytics team runs on exactly this
event shape. Both statistics are reduced to exact integer/decimal
cross-multiplications so no float accumulation order can diverge
between engines (the CUSUM/z-score trick from queries_ext45, applied to
inferential stats):

  two-proportion pooled z^2:
      z^2 = (x1*n2 - x2*n1)^2 * N / (n1*n2*x*(N-x)),  N=n1+n2, x=x1+x2
    -> compare 10000*num > 38416*den (1.96^2 = 3.8416) in DECIMAL(38,0);
       the reported z2_micro = floor(1e6*num/den) is one IEEE division
       on exact operands.

  chi-square cell contribution (n*O - R*C)^2 / (n*R*C):
    -> per-cell floor(1e6 * num/den) on exact DECIMAL operands, summed
       as integers (sum of floors — deterministic, unlike summing
       doubles).

Scale: both reduce the event stream with one map-side-combinable
aggregation (per-user firsts / per-cell counts); the test statistics run
over O(1) or O(cells) frames. The A/B split is the deterministic
hash-parity split (same family as train_val_test_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_AB_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INT) AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
  FROM per_user
), stat AS (
  SELECT n_a, x_a, n_b, x_b,
    CAST((x_a * n_b - x_b * n_a) AS DECIMAL(38,0)) AS diff_cross,
    CAST(n_a + n_b AS DECIMAL(38,0)) AS big_n,
    CAST(x_a + x_b AS DECIMAL(38,0)) AS x_tot
  FROM arms
)
SELECT n_a, x_a, n_b, x_b,
  CASE WHEN x_tot = 0 OR x_tot = big_n OR n_a = 0 OR n_b = 0 THEN NULL
       ELSE CAST(floor(
         CAST(diff_cross * diff_cross * big_n AS DOUBLE) * 1000000
         / CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * x_tot * (big_n - x_tot)
                AS DOUBLE)) AS BIGINT) END AS z2_micro,
  CASE WHEN x_tot = 0 OR x_tot = big_n OR n_a = 0 OR n_b = 0 THEN NULL
       ELSE (10000 * diff_cross * diff_cross * big_n
             > 38416 * CAST(n_a AS DECIMAL(38,0)) * n_b * x_tot
               * (big_n - x_tot)) END AS significant_95
FROM stat
"""


@register("ab_test_proportion_ztest", _AB_ORACLE)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-parity A/B split of users, conversion = any
    purchase; pooled two-proportion z^2 with the exact decimal
    cross-multiplied significance test at alpha = 0.05."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("converted")
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    arms = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    dec = "decimal(38,0)"
    diff_cross = (F.col("x_a") * F.col("n_b") - F.col("x_b") * F.col("n_a")).cast(
        dec
    )
    big_n = (F.col("n_a") + F.col("n_b")).cast(dec)
    x_tot = (F.col("x_a") + F.col("x_b")).cast(dec)
    den = (
        F.col("n_a").cast(dec)
        * F.col("n_b").cast(dec)
        * x_tot
        * (big_n - x_tot)
    )
    num = diff_cross * diff_cross * big_n
    degenerate = (
        (x_tot == 0)
        | (x_tot == big_n)
        | (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
    )
    return arms.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.when(degenerate, F.lit(None))
        .otherwise(
            F.floor(num.cast("double") * 1000000 / den.cast("double")).cast(
                "bigint"
            )
        )
        .alias("z2_micro"),
        F.when(degenerate, F.lit(None))
        .otherwise(num * 10000 > den * 38416)
        .alias("significant_95"),
    )


_CHI2_ORACLE = """
WITH cells AS (
  -- strftime %w is 0=Sunday..6; +1 matches Spark's dayofweek (1=Sunday)
  SELECT event_type, CAST(strftime(ts, '%w') AS INT) + 1 AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT event_type, dow, o,
    CAST(sum(o) OVER (PARTITION BY event_type) AS DECIMAL(38,0)) AS r,
    CAST(sum(o) OVER (PARTITION BY dow) AS DECIMAL(38,0)) AS c,
    CAST(sum(o) OVER () AS DECIMAL(38,0)) AS n
  FROM cells
), contrib AS (
  SELECT event_type, dow, o,
    CAST(floor(
      CAST((n * o - r * c) * (n * o - r * c) AS DOUBLE) * 1000000
      / CAST(n * r * c AS DOUBLE)) AS BIGINT) AS cell_chi2_micro
  FROM margins
)
SELECT
  CAST(count(*) AS BIGINT) AS n_cells,
  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT)
    AS dof,
  CAST(sum(cell_chi2_micro) AS BIGINT) AS chi2_micro
FROM contrib
"""


@register("event_type_dow_chi2", _CHI2_ORACLE)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of (event_type, day-of-week): per-cell
    contributions as floor(1e6 * (n*O - R*C)^2 / (n*R*C)) on exact
    decimal operands, summed as integers."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    dec = "decimal(38,0)"
    # margins over the O(cells) frame (|types| x 7) — tiny by construction
    m = (
        cells.withColumn(
            "r", F.sum("o").over(Window.partitionBy("event_type")).cast(dec)
        )
        .withColumn("c", F.sum("o").over(Window.partitionBy("dow")).cast(dec))
        .crossJoin(
            F.broadcast(cells.agg(F.sum("o").cast(dec).alias("n")))
        )
    )
    contrib = m.withColumn(
        "cell_chi2_micro",
        F.floor(
            ((F.col("n") * F.col("o") - F.col("r") * F.col("c"))
             * (F.col("n") * F.col("o") - F.col("r") * F.col("c"))).cast("double")
            * 1000000
            / (F.col("n") * F.col("r") * F.col("c")).cast("double")
        ).cast("bigint"),
    )
    return contrib.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.sum("cell_chi2_micro").cast("bigint").alias("chi2_micro"),
    )
