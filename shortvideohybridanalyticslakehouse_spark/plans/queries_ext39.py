"""Extension queries, round 39: robust statistics (median/MAD outlier
detection) and weighted sampling without replacement (Efraimidis-Spirakis
A-Res keys) — two more curation/QA primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Median/MAD robust outlier counts per event type
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
           AS med
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, e.value, m.med,
         round(abs(e.value - m.med), 6) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY adev), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       round(m2.med, 6) AS med, round(m2.mad, 6) AS mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (
         WHERE abs(d.value - d.med) > 3.5 * 1.4826 * m2.mad) AS BIGINT)
         AS n_outliers
FROM dev d
JOIN (SELECT m1.event_type, m1.med, mad.mad
      FROM med m1 JOIN mad ON mad.event_type = m1.event_type) m2
  ON m2.event_type = d.event_type
GROUP BY 1, 2, 3 ORDER BY 1
"""


@register("event_value_mad_outliers", _MAD_ORACLE)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |x - median| > 3.5 * 1.4826 * MAD per
    event type (the modified-z rule; 1.4826 scales MAD to sigma under
    normality). Unlike the 3-sigma screen (event_value_outliers), the
    median/MAD version doesn't let the outliers inflate their own
    threshold. Plan: two grouped exact medians over the event_type
    shuffle + an O(types) broadcast join-back — the fact scans twice
    (median needs a materialized first pass; at 100 TB swap in
    approx_percentile to make it one).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.round(F.abs(F.col("value") - F.col("med")), 6)
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    stats = med.join(mad, "event_type")
    out = dev.drop("med").join(F.broadcast(stats), "event_type")
    thresh = F.lit(3.5) * F.lit(1.4826) * F.col("mad")
    return (
        out.groupBy(
            "event_type", F.round(F.col("med"), 6).alias("med"),
            F.round(F.col("mad"), 6).alias("mad")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.abs(F.col("value") - F.col("med")) > thresh).alias(
                "n_outliers"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-Res keys)
# ---------------------------------------------------------------------------

_WSAMPLE_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS h
  FROM documents
), keyed AS (
  SELECT doc_id, source, w,
         round(pow(CAST(h AS DOUBLE) / 1152921504606846976.0,
                   1.0 / CAST(w AS DOUBLE)), 9) AS skey
  FROM t WHERE w > 0
)
SELECT doc_id, source, w, skey
FROM keyed
ORDER BY skey DESC, doc_id ASC
LIMIT 25
"""


@register("weighted_sample_topk", _WSAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis A-Res:
    each doc draws u = hash/2^60 (deterministic uniform) and keeps key
    u^(1/w) with w = token count; the top-k keys ARE a weighted sample
    without replacement. Fully distributed: the key is a scan-side
    expression, selection is TakeOrderedAndProject — the standard way to
    sample k items by weight from a corpus of any size in one pass.

    Determinism note: pow/ln may differ across libm builds in the last
    ulp, so the key is quantized (round 9) BEFORE ranking and ties break
    on doc_id — a sub-1e-9 pow divergence cannot change the sample.
    """
    t = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("w"),
        hash60(F.col("doc_id").cast("string")).alias("h"),
    )
    keyed = t.filter(F.col("w") > 0).withColumn(
        "skey",
        F.round(
            F.pow(
                F.col("h").cast("double") / F.lit(1152921504606846976.0),
                F.lit(1.0) / F.col("w").cast("double"),
            ),
            9,
        ),
    )
    return (
        keyed.select("doc_id", "source", "w", "skey")
        .orderBy(F.col("skey").desc(), F.col("doc_id").asc())
        .limit(25)
    )
