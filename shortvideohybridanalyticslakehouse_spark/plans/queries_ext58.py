"""Extension queries, round 58: interval analytics and multi-objective
frontiers — the sweep-line and skyline operator families.

Reference scope: the reference's session/interval story stops at the
gap-sessionization its M2 milestone defers (docs/DESIGN.md roadmap); the
operators here are the analytics a platform team runs ON those sessions
(capacity peaks) and on catalog economics (Pareto-optimal SKUs) — part of
the beyond-reference surface the brief asks for, each with a full DuckDB
oracle.

Scale design (100 TB):
- max_concurrent_sessions is the classic sweep line, but the running sum
  over boundary events uses operators/ranks.with_distributed_prefix_sum —
  NO single-partition window anywhere: sessionization is one keyed
  session_window aggregation, boundaries pre-aggregate per timestamp
  (map-side combinable), and the prefix sum is the bucketed two-phase
  exact form. Peak extraction is an ORDER BY + LIMIT 1
  (TakeOrderedAndProject).
- pareto_price_size_frontier reduces the heavy relation FIRST (max size
  per distinct price — map-side combinable groupBy), then runs the new
  with_distributed_prefix_max over the O(|distinct prices|) frame. The
  skyline test `size > max(size) over strictly-lower prices` is exact on
  a totally-ordered frame, turning the O(n^2) dominance NOT EXISTS (the
  oracle formulation) into one distributed prefix pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.ranks import (
    with_distributed_prefix_max,
    with_distributed_prefix_sum,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Sweep-line: peak concurrent sessions
# ---------------------------------------------------------------------------

# Sessions are the same 30-minute-gap session_window intervals as the
# user_sessions query (queries_ext3): [start, last_ts + 30min). A session
# ending at instant t is no longer active at t; one starting at t is.
# Concurrency therefore only needs evaluating "just after" each distinct
# boundary timestamp: net delta per ts = starts(ts) - ends(ts), and the
# inclusive running sum over ts IS the number of active sessions at ts.
_SWEEP_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), sessions AS (
  SELECT user_id, min(ts) AS s, max(ts) + INTERVAL 30 MINUTE AS e
  FROM numbered GROUP BY user_id, sess_id
), bounds AS (
  SELECT s AS ts, 1 AS delta FROM sessions
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM sessions
), per_ts AS (
  SELECT ts, CAST(sum(delta) AS BIGINT) AS net FROM bounds GROUP BY ts
), cum AS (
  SELECT ts, sum(net) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS conc
  FROM per_ts
)
SELECT
  CAST(conc AS BIGINT) AS peak_concurrency,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS peak_ts,
  (SELECT CAST(count(*) AS BIGINT) FROM sessions) AS n_sessions
FROM cum
ORDER BY conc DESC, ts ASC
LIMIT 1
"""


@register("max_concurrent_sessions", _SWEEP_ORACLE)
def q_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-active 30-minute-gap sessions and the
    instant it is first reached — a sweep line whose running sum is the
    distributed two-phase prefix sum, never a one-partition window."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.lit(1).alias("_one"))
    starts = sessions.select(F.col("w.start").alias("ts"), F.lit(1).alias("delta"))
    ends = sessions.select(F.col("w.end").alias("ts"), F.lit(-1).alias("delta"))
    per_ts = (
        starts.unionAll(ends)
        .groupBy("ts")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    cum = with_distributed_prefix_sum(
        per_ts, [], ["ts"], "net", out_col="_before", single_pass=True
    ).withColumn("conc", (F.col("_before") + F.col("net")).cast("bigint"))
    n_sessions = sessions.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        cum.orderBy(F.col("conc").desc(), F.col("ts").asc())
        .limit(1)
        .crossJoin(F.broadcast(n_sessions))
        .select(
            F.col("conc").alias("peak_concurrency"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("peak_ts"),
            "n_sessions",
        )
    )


# ---------------------------------------------------------------------------
# Skyline: Pareto frontier on (minimize price, maximize size)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH g AS (
  SELECT p_retailprice AS price, max(p_size) AS size,
         CAST(count(*) AS BIGINT) AS n_parts_at_price
  FROM part GROUP BY 1
)
SELECT CAST(a.price AS DOUBLE) AS price,
       CAST(a.size AS INT) AS size,
       a.n_parts_at_price
FROM g a
WHERE NOT EXISTS (
  SELECT 1 FROM g b WHERE b.price < a.price AND b.size >= a.size
)
"""


@register("pareto_price_size_frontier", _PARETO_ORACLE)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal (cheapest-for-their-size) catalog points: parts not
    dominated by any part that is strictly cheaper and at least as large.
    One groupBy collapses the catalog to its distinct price profile, then
    the skyline drops out of a single distributed exclusive prefix max —
    O(n log n) where the dominance-join oracle is O(n^2)."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("size"),
        F.count(F.lit(1)).alias("n_parts_at_price"),
    )
    flagged = with_distributed_prefix_max(g, [], ["price"], "size")
    return flagged.filter(
        F.col("_max_before").isNull() | (F.col("size") > F.col("_max_before"))
    ).select(
        F.col("price").cast("double").alias("price"),
        F.col("size").cast("int").alias("size"),
        "n_parts_at_price",
    )
