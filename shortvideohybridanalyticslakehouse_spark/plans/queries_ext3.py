"""Extension queries, round 2: rolling-hash document fingerprinting,
sessionization (the reference's deferred M2 scope), and the action-queue
cooldown semantics (D8) — each with a DuckDB oracle.

Scale notes per query in the docstrings; shared determinism rules as in
plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import text
from shortvideohybridanalyticslakehouse_spark.operators.dedup import latest_per_key
from shortvideohybridanalyticslakehouse_spark.operators.queue import enqueue
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (Rabin-Karp polynomial hash)
# ---------------------------------------------------------------------------

# h = fold(tokens, h*B + tokval mod P); B=131, P=1e9+7 keeps every
# intermediate < 2^63 on both engines (no overflow-semantics divergence).
_ROLLING_HASH_ORACLE = r"""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_'']+')) AS BIGINT)
    AS n_word_tokens,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
        t -> CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT))),
    (a, b) -> (a * 131 + b) % 1000000007) AS rolling_hash
FROM documents
"""


@register("doc_rolling_hash", _ROLLING_HASH_ORACLE)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling hash over the token stream + BPE-ish
    regex token count — the order-sensitive content fingerprint (md5 exact
    dedup is order-insensitive after normalization; this one is not).

    Narrow per-row higher-order-function expression: zero shuffle, fully
    pipelined into the scan, trivially parallel at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    c = F.col("text")
    tok_vals = F.transform(
        text.tokens(c),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint"),
    )
    rolling = F.aggregate(
        tok_vals,
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * F.lit(131) + v) % F.lit(1000000007),
    )
    return docs.select(
        "doc_id",
        text.word_token_count(c).cast("bigint").alias("n_word_tokens"),
        rolling.alias("rolling_hash"),
    )


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap session windows (T9 / M2 scope)
# ---------------------------------------------------------------------------

# Spark session_window semantics: an event extends the session iff it starts
# strictly before last_ts + gap; session_end = last_ts + gap. The oracle's
# gap-and-island LAG formulation uses >= for the new-session test to match.
_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT
  user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM numbered
GROUP BY user_id, sess_id
"""


@register("user_sessions", _SESSIONS_ORACLE)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: sessionization with a 30-minute inactivity gap via the native
    ``session_window`` aggregation (state-store-backed in streaming; a
    single keyed shuffle + sort in batch — no self-join, no LAG chain).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# Action-queue cooldown (D8) over the events fixture
# ---------------------------------------------------------------------------

_QUEUE_COOLDOWN_ORACLE = """
WITH cand AS (
  SELECT
    user_id AS video_id,
    date_trunc('minute', ts) AS window_start,
    CASE event_type WHEN 'purchase' THEN 'RESCUE'
                    WHEN 'signup'   THEN 'REVIEW'
                    ELSE 'BOOST' END AS decision_type,
    ts AS created_at,
    row_number() OVER (
      PARTITION BY user_id, date_trunc('minute', ts)
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE event_type IN ('purchase', 'signup', 'click')
), cooled AS (
  SELECT *, row_number() OVER (
    PARTITION BY video_id, CAST(floor(epoch(window_start) / 3600) AS BIGINT)
    ORDER BY CASE decision_type WHEN 'RESCUE' THEN 1
                                WHEN 'REVIEW' THEN 2 ELSE 3 END ASC,
             created_at DESC, window_start DESC) AS rn2
  FROM cand WHERE rn = 1
)
SELECT video_id, window_start, decision_type
FROM cooled WHERE rn2 = 1
"""


@register("action_queue_cooldown", _QUEUE_COOLDOWN_ORACLE)
def q_action_queue_cooldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: queue dedupe + 60-min cooldown with urgency precedence
    (RESCUE > REVIEW > BOOST), driven through operators.queue.enqueue.

    Fixture mapping: user_id plays video_id; purchase/signup/click map to
    RESCUE/REVIEW/BOOST candidates at 1-minute grain. Both row_number
    passes shuffle once on the video key — bucketable at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    mapped = ev.filter(
        F.col("event_type").isin("purchase", "signup", "click")
    ).select(
        F.col("user_id").alias("video_id"),
        F.date_trunc("minute", F.col("ts")).alias("window_start"),
        F.when(F.col("event_type") == "purchase", F.lit("RESCUE"))
        .when(F.col("event_type") == "signup", F.lit("REVIEW"))
        .otherwise(F.lit("BOOST"))
        .alias("decision_type"),
        F.col("ts").alias("created_at"),
        "event_id",
    )
    cand = latest_per_key(
        mapped,
        ["video_id", "window_start"],
        ["created_at", "event_id"],
        descending=True,
    ).drop("event_id")
    return enqueue(None, cand, cooldown_minutes=60).select(
        "video_id", "window_start", "decision_type"
    )


# ---------------------------------------------------------------------------
# BI health trend (A7) + governed baseline publish shape (A11/S11)
# ---------------------------------------------------------------------------

_HEALTH_TREND_ORACLE = """
WITH agg AS (
  SELECT
    user_id, date_trunc('minute', ts) AS metric_minute,
    count(*) FILTER (WHERE event_type = 'view') AS impressions,
    sum(CAST(value AS DECIMAL(18,2))) AS value_dec
  FROM events GROUP BY 1, 2
)
SELECT
  metric_minute,
  CAST(count(*) AS BIGINT) AS reporting_users,
  CAST(avg(impressions) AS DOUBLE) AS avg_impressions,
  CAST(sum(value_dec) AS DOUBLE) AS value_total
FROM agg GROUP BY 1
"""


@register("platform_health_trend", _HEALTH_TREND_ORACLE)
def q_platform_health_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-minute platform-wide averages over the 1-minute grain — the
    Metabase health-trend query shape (two chained partial-agg shuffles;
    second input is already minute-grain so it stays small at any scale).
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("metric_minute")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("impressions"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_dec"),
    )
    return agg.groupBy("metric_minute").agg(
        F.count(F.lit(1)).alias("reporting_users"),
        F.avg(F.col("impressions").cast("double")).alias("avg_impressions"),
        F.sum("value_dec").cast("double").alias("value_total"),
    )


_BASELINE_PUBLISH_ORACLE = """
SELECT 'rule_v1' AS rule_version, 'value' AS metric_name,
       0.90 AS percentile, round(quantile_cont(value, 0.90), 6) AS value,
       CAST(count(*) AS BIGINT) AS sample_size, TRUE AS is_global
FROM events
UNION ALL
SELECT 'rule_v1', 'value', 0.40, round(quantile_cont(value, 0.40), 6),
       CAST(count(*) AS BIGINT), TRUE
FROM events
"""


@register("quantile_baselines_publish", _BASELINE_PUBLISH_ORACLE)
def q_quantile_baselines_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/S11: governed quantile-baseline rows in the reference's published
    schema (rule_version + metric_name + percentile + value + sample_size +
    cohort flag), computed live instead of offline T+1. The idempotent-
    insert guard is the left-anti join exercised by anti_join_unsold_parts.

    Also the engine's one UNION (§2.7): two 1-row aggregates unioned.
    """
    ev = load_table(spark, sf_dir, "events")

    def row(pct: float) -> DataFrame:
        return ev.agg(
            F.lit("rule_v1").alias("rule_version"),
            F.lit("value").alias("metric_name"),
            F.lit(pct).alias("percentile"),
            F.round(F.expr(f"percentile(value, {pct}D)"), 6).alias("value"),
            F.count(F.lit(1)).alias("sample_size"),
            F.lit(True).alias("is_global"),
        )

    return row(0.90).unionByName(row(0.40))


# ---------------------------------------------------------------------------
# LSH-bucketed embedding near-dup (the ANN scale path)
# ---------------------------------------------------------------------------

def lsh_pairs_oracle(band_size: int = 4, limit: int = 20) -> str:
    """DuckDB twin of hyperplane_sketch + banded candidate join + cosine.

    Parameterized on ``band_size`` so recall variants of the same blocking
    (4-bit bands vs higher-recall 2-bit bands) share one oracle builder.
    """
    from shortvideohybridanalyticslakehouse_spark.functions import similarity

    signs = similarity.plane_signs(16, 64)
    n_bands = 16 // band_size
    mask = (1 << band_size) - 1
    bit_terms = " + ".join(
        "CASE WHEN list_sum(list_transform(range(1, 65), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ([{', '.join(map(str, s))}])[i])) > 0 "
        f"THEN {1 << p} ELSE 0 END"
        for p, s in enumerate(signs)
    )
    cos = (
        "round(list_sum(list_transform(range(1, 65), "
        "i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))) "
        "/ (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)))) "
        "* sqrt(list_sum(list_transform(range(1, 65), i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))))), 6)"
    )
    return f"""
WITH sk AS (
  SELECT vec_id, embedding, CAST({bit_terms} AS BIGINT) AS sketch
  FROM embeddings
), banded AS (
  SELECT vec_id, embedding, b AS band_id,
         (sketch >> ({band_size} * b)) & {mask} AS band_val
  FROM sk, range(0, {n_bands}) AS t(b)
), pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, {cos} AS cosine_sim
FROM pairs
ORDER BY cosine_sim DESC, id_a ASC, id_b ASC
LIMIT {limit}
"""


@register("embedding_lsh_topk", lsh_pairs_oracle(band_size=4))
def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-LSH-blocked near-dup pairs + exact cosine top-20.

    The embedding analog of MinHash-LSH: shuffle ∝ vectors x 4 bands on
    uniform 4-bit band keys — never vectors² — then exact cosine on the
    candidates only, scored per band bucket with an Arrow GEMM (local
    top-20 per bucket; see similarity.lsh_bucket_topk_pairs — no
    candidate-pair materialization).
    """
    from shortvideohybridanalyticslakehouse_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    return similarity.lsh_bucket_topk_pairs(emb, n_planes=16, band_size=4, k=20)


# ---------------------------------------------------------------------------
# TPC-H-shaped classics over the fixture tables
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_ORACLE)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan-dominated aggregation, the canonical
    pricing-summary report. One map-side-combined shuffle to a handful of
    groups; the shipdate filter reaches the parquet scan (PushedFilters).
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount"))
                * (F.lit(1) + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT
  l.l_orderkey,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@register("tpch_q3_shipping_priority", _Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact-fact join,
    grouped revenue, top-10. Both date predicates push to the scans; the
    customer side broadcasts; lineitem⋈orders shuffles on the order key.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Reconciliation: realtime (1-min incremental) vs T+1 batch recompute (A12)
# ---------------------------------------------------------------------------

_RECONCILIATION_ORACLE = """
WITH rt AS (
  SELECT user_id, date_trunc('minute', ts) AS m, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), rt_day AS (
  SELECT user_id, date_trunc('day', m) AS d, CAST(sum(n) AS BIGINT) AS rt_n
  FROM rt GROUP BY 1, 2
), batch_day AS (
  SELECT user_id, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS batch_n
  FROM events GROUP BY 1, 2
)
SELECT d,
  CAST(count(*) AS BIGINT) AS keys,
  round(quantile_cont(
    abs(rt_n - batch_n) / greatest(CAST(batch_n AS DOUBLE), 100.0), 0.95), 6)
    AS p95_rel_err,
  CAST(count(*) FILTER (WHERE rt_n = batch_n) AS BIGINT) AS exact_matches
FROM rt_day JOIN batch_day USING (user_id, d)
GROUP BY d
"""


@register("reconciliation_rt_vs_batch", _RECONCILIATION_ORACLE)
def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the reference's daily reconciliation gate — roll the realtime
    1-minute incremental fact up to day grain and compare against a direct
    T+1 batch recompute; report p95 relative error per day (SLO: <= 0.08)
    and exact-match counts. Here both paths read the same immutable fixture
    so the error is structurally zero — the assertion the gate encodes.
    """
    ev = load_table(spark, sf_dir, "events")
    rt = (
        ev.groupBy("user_id", F.date_trunc("minute", F.col("ts")).alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id", F.date_trunc("day", F.col("m")).alias("d"))
        .agg(F.sum("n").alias("rt_n"))
    )
    batch = ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("batch_n")
    )
    joined = rt.join(batch, ["user_id", "d"])
    rel_err = F.abs(F.col("rt_n") - F.col("batch_n")) / F.greatest(
        F.col("batch_n").cast("double"), F.lit(100.0)
    )
    return joined.groupBy("d").agg(
        F.count(F.lit(1)).alias("keys"),
        F.round(F.expr(
            "percentile(abs(rt_n - batch_n) / greatest(cast(batch_n as double), 100.0D), 0.95D)"
        ), 6).alias("p95_rel_err"),
        F.count(F.when(F.col("rt_n") == F.col("batch_n"), 1)).alias("exact_matches"),
    )


# ---------------------------------------------------------------------------
# Ranking-per-group and ROLLUP (capability beyond the reference's inventory)
# ---------------------------------------------------------------------------

_TOPK_PER_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(rank() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


@register("topk_orders_per_customer", _TOPK_PER_GROUP_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via rank(): the per-group top-k pattern
    (one keyed shuffle + in-partition sort; never a global sort)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


_ROLLUP_ORACLE = """
SELECT
  coalesce(l_returnflag, '__total__') AS returnflag,
  coalesce(l_linestatus, '__total__') AS linestatus,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem_status", _ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag -> flag+status -> grand total) in one
    pass — Spark expands grouping sets inside a single partial-aggregated
    shuffle instead of three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_sum"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("__total__")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("__total__")).alias("linestatus"),
            "n",
            "qty_sum",
        )
    )


# ---------------------------------------------------------------------------
# Set operations: EXCEPT / INTERSECT (§2.7 — beyond the reference's UNION)
# ---------------------------------------------------------------------------

_SET_OPS_ORACLE = """
WITH early AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01'
), late AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-01-01'
)
SELECT 'churned' AS cohort, CAST(count(*) AS BIGINT) AS n
FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
UNION ALL
SELECT 'retained', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
"""


@register("customer_cohort_set_ops", _SET_OPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/INTERSECT cohort split (churned vs retained buyers across a
    date boundary). Both compile to hash aggregates + left-anti/left-semi
    joins — one shuffle each on the key, no sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    early = (
        orders.filter(F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
    )
    late = (
        orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
    )
    churned = early.exceptAll(late).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("churned").alias("cohort"), "n"
    )
    retained = early.intersect(late).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("retained").alias("cohort"), "n"
    )
    return churned.unionByName(retained)


# Deterministic medoid quantizer: same arithmetic replayed on both engines.
_SQ_L2 = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)
_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 6)"
)

_MEDOID_IVF_ORACLE = f"""
WITH med AS (
  SELECT vec_id AS cell_id, embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 8
), dist AS (
  SELECT e.vec_id, e.embedding, m.cell_id,
         {_SQ_L2.format(a='e.embedding', b='m.embedding')} AS d2
  FROM embeddings e CROSS JOIN med m
), assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY d2, cell_id) AS rn
    FROM dist)
  WHERE rn = 1
), q AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
), probe AS (
  SELECT m.cell_id
  FROM med m CROSS JOIN q
  ORDER BY {_SQ_L2.format(a='q.embedding', b='m.embedding')}, m.cell_id
  LIMIT 3
)
SELECT a.vec_id, {_COS.format(a='a.embedding', b='q.embedding')} AS cosine_sim
FROM assigned a JOIN probe p ON a.cell_id = p.cell_id CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cosine_sim DESC, a.vec_id ASC
LIMIT 10
"""


@register("embedding_kmeans_ivf_topk", _MEDOID_IVF_ORACLE)
def q_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN with a quantizer SPLIT from the search so the routing arithmetic
    is SQL-reproducible: deterministic hash-seeded medoids (8 corpus
    vectors with smallest md5(id)) stand in for the trained centroids,
    squared-L2 assignment with id tie-break, nprobe=3 nearest cells
    (always containing the query's own cell), cosine top-10 within the
    probed cells. The TRAINED pyspark.ml KMeans variant
    (similarity.kmeans_ivf_topk) keeps the same search path and is
    asserted by recall tests (tests/test_kmeans_ivf.py) — k-means||
    initialization itself is not SQL-reproducible.
    """
    from shortvideohybridanalyticslakehouse_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    return similarity.medoid_ivf_topk(emb, query_id=0, k=10)


# ---------------------------------------------------------------------------
# PIVOT and LAG/LEAD families
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT
  user_id,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY user_id
"""


@register("pivot_event_type_counts", _PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-values pivot: per-user event-type count matrix. With pinned
    pivot values Spark compiles this to one pass of conditional aggregates
    — exactly the oracle's FILTER form, no second value-discovery job.
    """
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combinations; the FILTER form yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in types],
    )


_LAG_GAP_ORACLE = """
WITH g AS (
  SELECT
    user_id, event_id, ts,
    lag(ts)  OVER w AS prev_ts,
    lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT
  user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(max(CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT)) AS BIGINT) AS max_gap_s,
  CAST(min(CAST(floor(epoch(next_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS min_gap_s,
  CAST(count(*) FILTER (
    WHERE CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800) AS BIGINT)
    AS session_breaks
FROM g GROUP BY user_id
"""


@register("event_gap_analysis", _LAG_GAP_ORACLE)
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD inter-event gaps per user (the reference's deferred M2
    LAG-stitching shape): max/min gaps and 30-minute session-break counts.
    One keyed shuffle + sort shared by both window functions.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.lag(F.col("ts").cast("long")).over(w).alias("prev_s"),
        F.lead(F.col("ts").cast("long")).over(w).alias("next_s"),
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col("ts_s") - F.col("prev_s")).alias("max_gap_s"),
        F.min(F.col("next_s") - F.col("ts_s")).alias("min_gap_s"),
        F.count(F.when(F.col("ts_s") - F.col("prev_s") > 1800, 1)).alias(
            "session_breaks"
        ),
    )


_SUPPLIER_BALANCE_ORACLE = """
SELECT
  n.n_name AS nation_name,
  CAST(count(*) AS BIGINT) AS suppliers,
  CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_total,
  CAST(count(*) FILTER (WHERE s.s_acctbal < 0) AS BIGINT) AS in_debt
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""


@register("supplier_balance_by_nation", _SUPPLIER_BALANCE_ORACLE)
def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance rollup per nation (broadcast dim join +
    exact-decimal aggregation) — covers the last fixture table."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("acctbal_total"),
            F.count(F.when(F.col("s_acctbal") < 0, 1)).alias("in_debt"),
        )
    )


_GROUPED_PCTL_ORACLE = """
SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.90), 6) AS p90,
  round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


@register("value_percentiles_by_type", _GROUPED_PCTL_ORACLE)
def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11 grouped form: exact interpolated percentiles per event type
    (ObjectHashAggregate per group; swap percentile_approx at 100 TB —
    t-digest sketches merge map-side, exact percentile buffers values).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.50D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


_SPLIT_ORACLE = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(doc_id) AS BIGINT) AS min_doc_id,
  CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM h GROUP BY 1
"""


@register("train_val_test_split", _SPLIT_ORACLE)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 dataset split by content-id hash — the
    reproducible-split primitive every training pipeline needs (same doc
    lands in the same split on any engine, any partitioning, any rerun;
    unlike sampleBy/randomSplit which depend on partition layout).
    """
    from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
