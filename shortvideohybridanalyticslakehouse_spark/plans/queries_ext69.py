"""Extension queries, round 69: Lorenz curve deciles — the distribution
view behind the Gini scalar (queries_ext66): how much of total purchase
spend each spend-ranked tenth of the user base contributes, plus the
cumulative share (the Lorenz ordinate). Deciles come from the same
distributed exact rank + arithmetic ntile; shares are floored micro
units of exact integer cents (one IEEE division per decile row over the
O(10) frame)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.ranks import (
    ntile_from_rank,
    with_distributed_row_number,
)
from shortvideohybridanalyticslakehouse_spark.plans.money import (
    PURCHASE_CENTS_SQL as _CENTS,
    purchase_cents,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_LORENZ_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
    {_CENTS}
      AS cents
  FROM events GROUP BY user_id
), ranked AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents ASC, user_id ASC) AS decile
  FROM per_user
), d AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(cents) AS BIGINT) AS decile_cents
  FROM ranked GROUP BY 1
), t AS (
  SELECT CAST(sum(decile_cents) AS BIGINT) AS total FROM d
)
SELECT CAST(decile AS INT) AS decile, n_users, decile_cents,
  CAST(floor(CAST(decile_cents AS DOUBLE) * 1000000
       / CAST(t.total AS DOUBLE)) AS BIGINT) AS share_micro,
  CAST(floor(CAST(sum(decile_cents) OVER (ORDER BY decile
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) * 1000000
       / CAST(t.total AS DOUBLE)) AS BIGINT) AS cum_share_micro
FROM d CROSS JOIN t
"""


@register("user_spend_lorenz_deciles", _LORENZ_ORACLE)
def q_user_spend_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per spend-ranked decile of users: exact cents, floored micro
    share, and the cumulative Lorenz ordinate. The cumulative sum runs
    over the O(10) decile frame via the broadcast suffix/prefix
    self-join idiom (no single-partition window)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        purchase_cents().alias("cents")
    )
    ranked = with_distributed_row_number(
        per_user, [], ["cents", "user_id"], n_buckets=16, rn_col="_i",
        n_col="_n", single_pass=True,
    ).withColumn("decile", ntile_from_rank(F.col("_i"), F.col("_n"), 10))
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("decile_cents"),
    )
    t = d.agg(F.sum("decile_cents").cast("bigint").alias("total"))
    earlier = d.select(
        F.col("decile").alias("_ed"), F.col("decile_cents").alias("_ec")
    )
    cum = (
        d.join(F.broadcast(earlier), F.col("_ed") <= F.col("decile"), "inner")
        .groupBy("decile", "n_users", "decile_cents")
        .agg(F.sum("_ec").cast("bigint").alias("_cum"))
    )
    return cum.crossJoin(F.broadcast(t)).select(
        F.col("decile").cast("int").alias("decile"),
        "n_users",
        "decile_cents",
        F.floor(
            F.col("decile_cents").cast("double")
            * 1000000
            / F.col("total").cast("double")
        )
        .cast("bigint")
        .alias("share_micro"),
        F.floor(
            F.col("_cum").cast("double") * 1000000 / F.col("total").cast("double")
        )
        .cast("bigint")
        .alias("cum_share_micro"),
    )
