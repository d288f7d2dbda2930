"""Extension queries, round 9: training-data curation surface —
Gopher-style document quality-filter funnel, stratified deterministic
sampling, hopping (sliding) window aggregation, and embedding centroid
diagnostics. Each with a DuckDB oracle.

Scale notes are per-query; the shared theme: every metric is built from
exact integer counts (ratios become identical double divisions on both
engines, so even threshold-boundary rows classify the same way), and
every aggregation is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Document quality-filter funnel (Gopher/C4-style heuristics)
# ---------------------------------------------------------------------------

# Thresholds tuned to split the fixture corpus non-trivially while keeping
# the published heuristic shapes (Rae et al. 2021 "Gopher" §A1.1 filters:
# word-length band, type-token ratio, single-token domination; C4's
# min-length rule). Contract-locked: the oracle repeats them literally.
QF_MIN_TOKENS = 20
QF_MEAN_WORD_LEN_LO = 4.0
QF_MEAN_WORD_LEN_HI = 5.0
QF_MIN_TTR = 0.45
QF_MAX_TOP_FRACTION = 0.12

_QUALITY_FUNNEL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
), per_tok AS (
  SELECT doc_id, source, token, count(*) AS cnt FROM tok GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, source,
         CAST(sum(cnt) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS top_cnt,
         CAST(sum(cnt * len(token)) AS BIGINT) AS sum_len
  FROM per_tok GROUP BY 1, 2
), flags AS (
  SELECT source,
         (n_tok >= {QF_MIN_TOKENS}) AS pass_min_len,
         (CAST(sum_len AS DOUBLE) / n_tok >= {QF_MEAN_WORD_LEN_LO}
          AND CAST(sum_len AS DOUBLE) / n_tok <= {QF_MEAN_WORD_LEN_HI})
           AS pass_word_len,
         (CAST(n_distinct AS DOUBLE) / n_tok >= {QF_MIN_TTR}) AS pass_ttr,
         (CAST(top_cnt AS DOUBLE) / n_tok <= {QF_MAX_TOP_FRACTION})
           AS pass_repetition
  FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE pass_min_len) AS BIGINT) AS n_pass_min_len,
       CAST(count(*) FILTER (WHERE pass_word_len) AS BIGINT) AS n_pass_word_len,
       CAST(count(*) FILTER (WHERE pass_ttr) AS BIGINT) AS n_pass_ttr,
       CAST(count(*) FILTER (WHERE pass_repetition) AS BIGINT)
         AS n_pass_repetition,
       CAST(count(*) FILTER (WHERE pass_min_len AND pass_word_len
                             AND pass_ttr AND pass_repetition) AS BIGINT)
         AS n_pass_all
FROM flags GROUP BY source
"""


@register("doc_quality_filter_funnel", _QUALITY_FUNNEL_ORACLE)
def q_doc_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus quality funnel: how many documents survive each
    Gopher-style heuristic (min length, mean-word-length band, type-token
    ratio, single-token domination) and all of them together.

    Plan shape for 100 TB: one narrow explode (no shuffle), then two
    map-side-combinable hash aggregations keyed on doc_id — per-token
    state collapses to per-(doc,token) counts before the first exchange,
    and per-doc rows collapse to |sources| rows before the second. No
    windows, no Python; all ratios are double divisions of exact ints so
    boundary documents classify identically on any engine.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    per_tok = tok.groupBy("doc_id", "source", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = per_tok.groupBy("doc_id", "source").agg(
        F.sum("cnt").alias("n_tok"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.col("cnt") * F.length("token")).alias("sum_len"),
    )
    n_tok = F.col("n_tok").cast("double")
    mean_len = F.col("sum_len").cast("double") / n_tok
    ttr = F.col("n_distinct").cast("double") / n_tok
    top_frac = F.col("top_cnt").cast("double") / n_tok
    flags = per_doc.select(
        "source",
        (F.col("n_tok") >= QF_MIN_TOKENS).alias("pass_min_len"),
        ((mean_len >= QF_MEAN_WORD_LEN_LO) & (mean_len <= QF_MEAN_WORD_LEN_HI)).alias(
            "pass_word_len"
        ),
        (ttr >= QF_MIN_TTR).alias("pass_ttr"),
        (top_frac <= QF_MAX_TOP_FRACTION).alias("pass_repetition"),
    )

    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("pass_min_len"), 1)).alias("n_pass_min_len"),
        F.count(F.when(F.col("pass_word_len"), 1)).alias("n_pass_word_len"),
        F.count(F.when(F.col("pass_ttr"), 1)).alias("n_pass_ttr"),
        F.count(F.when(F.col("pass_repetition"), 1)).alias("n_pass_repetition"),
        F.count(
            F.when(
                F.col("pass_min_len")
                & F.col("pass_word_len")
                & F.col("pass_ttr")
                & F.col("pass_repetition"),
                1,
            )
        ).alias("n_pass_all"),
    )


# ---------------------------------------------------------------------------
# Stratified deterministic sampling (per-class rates)
# ---------------------------------------------------------------------------

# Per-stratum keep rates in permille: rare/expensive classes kept whole,
# bulk classes downsampled — the class-rebalancing shape every training
# pipeline needs. Content-hash Bernoulli (not df.sample) so the sample is
# stable across reruns, engines, and partition layouts.
STRATA_PERMILLE = {"purchase": 1000, "signup": 500, "error": 250}
STRATA_DEFAULT_PERMILLE = 100

_STRATIFIED_ORACLE = f"""
WITH tagged AS (
  SELECT event_type, user_id, value,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1000 AS bucket,
         CASE event_type
           WHEN 'purchase' THEN {STRATA_PERMILLE['purchase']}
           WHEN 'signup' THEN {STRATA_PERMILLE['signup']}
           WHEN 'error' THEN {STRATA_PERMILLE['error']}
           ELSE {STRATA_DEFAULT_PERMILLE} END AS keep_permille
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM tagged WHERE bucket < keep_permille
GROUP BY event_type
"""


@register("stratified_event_sample", _STRATIFIED_ORACLE)
def q_stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sample with per-class keep rates (purchase
    100%, signup 50%, error 25%, rest 10%) keyed on a content hash of the
    row id. The rate lookup is a literal CASE (no join), the predicate is
    a scan-stage filter, and rejected rows never reach an exchange — the
    only stratified-sampling shape that holds at 100 TB. df.sampleBy is
    seed+partition-layout dependent; this is reproducible anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    rate = F.col("event_type")
    keep = F.lit(STRATA_DEFAULT_PERMILLE)
    for etype, permille in STRATA_PERMILLE.items():
        keep = F.when(rate == etype, F.lit(permille)).otherwise(keep)
    sampled = ev.filter(
        hash60(F.col("event_id").cast("string")) % 1000 < keep
    )
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) window aggregation
# ---------------------------------------------------------------------------

# 5-minute windows advancing every minute: each event lands in exactly 5
# windows. The oracle manufactures the same membership by exploding the 5
# slide offsets — the textbook semantics Spark's window(slideDuration)
# implements natively.
_HOPPING_ORACLE = """
WITH hop AS (
  SELECT date_trunc('minute', ts) - (k * INTERVAL 1 MINUTE) AS window_start,
         user_id, value
  FROM events, unnest([0, 1, 2, 3, 4]) AS offs(k)
  WHERE ts IS NOT NULL
)
SELECT window_start,
       window_start + INTERVAL 5 MINUTE AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM hop GROUP BY 1, 2
"""


@register("hopping_window_event_counts", _HOPPING_ORACLE)
def q_hopping_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute hopping windows sliding by 1 minute (native
    ``window(ts, '5 minutes', '1 minute')`` — the smoothed-trend view
    between the 1-min tumbling fact and the 30-min RANGE frame; identical
    plan in Structured Streaming with a watermark). The 5x row expansion
    happens inside the aggregation's generate step with map-side partial
    combine — the shuffle carries one row per (window, task), not 5x the
    events.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    win = F.window(F.col("ts"), "5 minutes", "1 minute")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "value_sum"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# Embedding centroid diagnostics (cluster cohesion per label)
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH elem AS (
  SELECT label, vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
), centroid AS (
  SELECT label, pos, avg(val) AS c FROM elem GROUP BY 1, 2
), cnorm AS (
  SELECT label, sqrt(sum(c * c)) AS centroid_norm FROM centroid GROUP BY 1
), dots AS (
  SELECT e.label, e.vec_id,
         sum(e.val * c.c) AS dot,
         sqrt(sum(e.val * e.val)) AS vnorm
  FROM elem e JOIN centroid c ON e.label = c.label AND e.pos = c.pos
  GROUP BY 1, 2
)
SELECT d.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(any_value(n.centroid_norm), 4) AS centroid_norm,
       round(avg(d.dot / (d.vnorm * n.centroid_norm)), 4) AS avg_cos_to_centroid
FROM dots d JOIN cnorm n ON d.label = n.label
GROUP BY d.label
"""


@register("embedding_centroid_stats", _CENTROID_ORACLE)
def q_embedding_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm and mean cosine-to-centroid — the cluster
    cohesion diagnostic used to QA embedding spaces before IVF/ANN index
    builds (a collapsed label ⇒ avg_cos→1; a diffuse one ⇒ →0).

    Every step is an equi-keyed aggregation/join on (label) or
    (label, pos): posexplode is narrow, centroids reduce to
    |labels|·dim rows (always broadcastable), and the dot products
    re-aggregate on vec_id. Rounded to 4 decimals so float-sum add-order
    differences (~1e-13 relative) can't flip the hash.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("label", "vec_id", "embedding")
    elem = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("pos0", "valf"),
    ).select(
        "label", "vec_id", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val")
    )
    centroid = elem.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    cnorm = centroid.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("centroid_norm")
    )
    dots = (
        elem.join(F.broadcast(centroid), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vnorm"),
        )
    )
    return (
        dots.join(F.broadcast(cnorm), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.first("centroid_norm"), 4).alias("centroid_norm"),
            F.round(
                F.avg(F.col("dot") / (F.col("vnorm") * F.col("centroid_norm"))), 4
            ).alias("avg_cos_to_centroid"),
        )
    )
