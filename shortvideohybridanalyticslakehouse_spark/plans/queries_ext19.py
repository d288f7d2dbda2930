"""Extension queries, round 19: set-valued aggregation with deterministic
rendering (sort_array ∘ collect_set), rank-with-ties top-k (rank ≤ k vs
LIMIT k), and max_by/min_by argmin-style lookups.

These close the remaining aggregate-function families: set collection
(order-nondeterministic by nature — rendered deterministic by sorting
before serialization), ranking cuts that keep ties (LIMIT k drops
them), and "value at the extremum of another column" without a window
or self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Deterministic set-valued aggregation
# ---------------------------------------------------------------------------

# collect_set order depends on partitioning/arrival — NEVER comparable
# across engines or runs. Sorting the set before serialization makes
# the value deterministic; the CSV rendering keeps the oracle hashable.
_COLLECT_ORACLE = """
SELECT
  user_id,
  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
  CAST(len(list(DISTINCT event_type)) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


@register("user_event_type_sets", _COLLECT_ORACLE)
def q_user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's distinct event-type vocabulary as a sorted CSV — the
    set-valued aggregation pattern with the ONLY safe rendering:
    sort_array before serializing (raw collect_set order is partition-
    dependent and would hash-differ run to run).
    """
    ev = load_table(spark, sf_dir, "events")
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", types).alias("types_csv"),
        F.size(types).cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# Rank-with-ties top-k (rank <= k keeps ties; LIMIT k would drop them)
# ---------------------------------------------------------------------------

# topk_orders_per_customer (ledgered) uses row_number — exactly k rows,
# ties broken arbitrarily-but-deterministically. This is the OTHER
# contract: every order tied with the k-th survives, so group sizes
# vary. Same WindowGroupLimit physical heap serves both.
_RANK_TIES_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS rk
  FROM orders
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""


@register("top3_orders_with_ties", _RANK_TIES_ORACLE)
def q_top3_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer INCLUDING price ties (rank ≤ 3, so a
    group can exceed 3 rows) — the tie-preserving alternative to the
    row_number top-k; decimal ordering keys keep rank boundaries
    engine-exact.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc()
    )
    return (
        orders.select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# max_by / min_by: value at another column's extremum, no window needed
# ---------------------------------------------------------------------------

# The ordering key is a UNIQUE bigint (epoch micros ·1000 + event_id
# mod 1000): max_by semantics are undefined under key ties, so the key
# must be collision-free for cross-engine determinism. One plain agg —
# no window sort, no join-back; the cheapest first/last-value shape.
_MAXBY_ORACLE = """
SELECT
  user_id,
  CAST(arg_min(value, epoch_us(ts) * 1000 + event_id % 1000) AS DOUBLE)
    AS first_value,
  CAST(arg_max(value, epoch_us(ts) * 1000 + event_id % 1000) AS DOUBLE)
    AS last_value,
  arg_max(event_type, epoch_us(ts) * 1000 + event_id % 1000) AS last_type
FROM events GROUP BY user_id
"""


@register("user_first_last_event_values", _MAXBY_ORACLE)
def q_user_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last event value (and last type) per user via
    min_by/max_by over a unique time-ordered key — extremum lookup as a
    plain hash aggregate (map-side combinable) instead of a windowed
    sort over every row.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.unix_micros(F.col("ts")) * 1000 + F.col("event_id") % 1000
    return ev.groupBy("user_id").agg(
        F.min_by("value", key).cast("double").alias("first_value"),
        F.max_by("value", key).cast("double").alias("last_value"),
        F.max_by("event_type", key).alias("last_type"),
    )
