"""Extension queries, round 10: corpus/key diagnostics for the training-
data pipeline — per-document token entropy, global top-bigram extraction,
sequence-length bucket packing waste, heavy-hitter key-skew profiling, and
time-decayed engagement scoring. Each with a DuckDB oracle.

Cross-engine determinism notes: entropy uses the algebraic identity
H = log2(n) − (Σ cnt·log2 cnt)/n so both engines evaluate the SAME double
expression over exact integer counts; decayed sums round to 4 decimals
(float add-order differences are ~1e-13 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Per-document unigram Shannon entropy
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
), per_tok AS (
  SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_tok,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE)))
               / CAST(sum(cnt) AS DOUBLE),
             6) AS entropy_bits
FROM per_tok GROUP BY doc_id
"""


@register("doc_token_entropy", _ENTROPY_ORACLE)
def q_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document — the information-density
    quality signal (near-0 ⇒ degenerate repetition; ≈log2(n_distinct) ⇒
    uniform vocabulary use). H = log2(n) − (Σ cnt·log2 cnt)/n turns the
    usual two-pass p·log p into ONE map-side-combinable aggregation over
    (doc, token) counts — no second shuffle for the totals, and both
    engines evaluate identical double operands (counts are exact ints).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    per_tok = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").cast("double")
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tok"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log2(n)
            - F.sum(F.col("cnt").cast("double") * F.log2(F.col("cnt").cast("double")))
            / n,
            6,
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Global top-k bigrams
# ---------------------------------------------------------------------------

TOP_BIGRAMS_K = 20

_BIGRAMS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), pos AS (
  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
  FROM tok
), bigram AS (
  SELECT a.token || ' ' || b.token AS bigram
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM bigram GROUP BY bigram
ORDER BY cnt DESC, bigram ASC
LIMIT {TOP_BIGRAMS_K}
"""


@register("top_bigrams", _BIGRAMS_ORACLE)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams (count desc, lexicographic tie-break —
    pinned so the LIMIT boundary is engine-independent). Bigrams are
    manufactured inside each row by a higher-order ``transform`` over the
    token array — no positional self-join, no extra shuffle; then one
    count aggregation and a TakeOrderedAndProject top-k (per-partition
    heap, never a global sort). The n-gram LM / contamination-check
    primitive at corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bigrams = docs.select(toks.alias("toks")).filter(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.col("toks")[i], F.col("toks")[i + 1]),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(TOP_BIGRAMS_K)
    )


# ---------------------------------------------------------------------------
# Sequence-length bucket packing waste
# ---------------------------------------------------------------------------

# Power-of-two context buckets (the padded-batch shape): a doc of n tokens
# pads to the smallest bucket cap >= n; waste = padded - real tokens.
PACKING_BUCKETS = (32, 64, 128, 256)

_PACKING_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
           AS n_tok
  FROM documents
), bucketed AS (
  SELECT n_tok,
         CASE WHEN n_tok <= 32 THEN 32
              WHEN n_tok <= 64 THEN 64
              WHEN n_tok <= 128 THEN 128
              ELSE 256 END AS bucket_cap
  FROM tok
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS real_tokens,
       CAST(count(*) * bucket_cap AS BIGINT) AS padded_tokens,
       round(1.0 - CAST(sum(n_tok) AS DOUBLE)
                   / CAST(count(*) * bucket_cap AS DOUBLE), 6) AS waste_ratio
FROM bucketed GROUP BY bucket_cap
"""


@register("token_length_bucket_packing", _PACKING_ORACLE)
def q_token_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded-batch packing audit: docs binned to power-of-two context
    buckets with the padding waste each bucket would cost — the
    measurement that decides bucketed batching vs sequence packing for a
    training run. Token counts come from ``size(split(...))`` (no
    explode); the rollup groups on a 4-value domain so the shuffle
    carries 4 rows per task at any input size.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint")
    cap = F.lit(PACKING_BUCKETS[-1])
    for b in reversed(PACKING_BUCKETS[:-1]):
        cap = F.when(n_tok <= b, F.lit(b)).otherwise(cap)
    bucketed = docs.select(n_tok.alias("n_tok"), cap.alias("bucket_cap"))
    return bucketed.groupBy("bucket_cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("real_tokens"),
        (F.count(F.lit(1)) * F.col("bucket_cap")).alias("padded_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tok").cast("double")
            / (F.count(F.lit(1)) * F.col("bucket_cap")).cast("double"),
            6,
        ).alias("waste_ratio"),
    )


# ---------------------------------------------------------------------------
# Heavy-hitter key-skew profile
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10

_SKEW_ORACLE = f"""
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(sum(n_events) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n_events) AS BIGINT) AS max_key
  FROM per_key
)
SELECT p.user_id, p.n_events,
       round(CAST(p.n_events AS DOUBLE) / t.total, 6) AS share,
       round(CAST(p.n_events AS DOUBLE) * t.n_keys / t.total, 4)
         AS skew_vs_uniform
FROM per_key p CROSS JOIN tot t
ORDER BY p.n_events DESC, p.user_id ASC
LIMIT {SKEW_TOP_K}
"""


@register("user_key_skew_profile", _SKEW_ORACLE)
def q_user_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest shuffle keys with their share of total rows and
    skew factor vs a uniform key distribution — the diagnostic that
    decides when a join/agg key needs salting (operators/skew.py) or AQE
    skew-join splitting. One map-side-combinable count per key, a 1-row
    global anchor broadcast back, and a top-k heap; deterministic
    tie-break on user_id.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    tot = per_key.agg(
        F.sum("n_events").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_events").alias("max_key"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.round(
                F.col("n_events").cast("double") * F.col("n_keys") / F.col("total"), 4
            ).alias("skew_vs_uniform"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(SKEW_TOP_K)
    )


# ---------------------------------------------------------------------------
# Time-decayed engagement score
# ---------------------------------------------------------------------------

DECAY_TAU_SECONDS = 86_400.0  # 1-day half-life-ish exponential decay

_DECAY_ORACLE = f"""
WITH anchor AS (
  SELECT max(ts) AS max_ts FROM events WHERE ts IS NOT NULL
)
SELECT e.user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(CAST(e.value AS DOUBLE)
                 * exp(-CAST(date_diff('second', e.ts, a.max_ts) AS DOUBLE)
                       / {DECAY_TAU_SECONDS})), 4) AS decayed_value
FROM events e CROSS JOIN anchor a
WHERE e.ts IS NOT NULL
GROUP BY e.user_id
"""


@register("time_decay_engagement", _DECAY_ORACLE)
def q_time_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed engagement (τ = 1 day),
    anchored at the corpus max timestamp — the recency-weighted feature
    shape (freshness-biased sampling weights, trending scores). The
    anchor is a 1-row aggregate broadcast into a scan-stage expression;
    the decay weight is per-row arithmetic, then one grouped sum. Rounded
    to 4 decimals (float add-order tolerance).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    age_s = (F.col("max_ts").cast("long") - F.col("ts").cast("long")).cast("double")
    return (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    F.col("value").cast("double")
                    * F.exp(-age_s / F.lit(DECAY_TAU_SECONDS))
                ),
                4,
            ).alias("decayed_value"),
        )
    )
