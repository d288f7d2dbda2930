"""Extension queries, round 99: corpus-operations dashboards — the
per-source quality scorecard (the single table a crawl operator reads
before adjusting source weights) and traffic seasonality indices.

The scorecard composes four quality lanes the engine already defines —
marker-n-gram language ID (ext25 profiles, imported so the detectors
cannot drift), prefix-fingerprint duplication (ext98), length floor,
mean length — into one per-source row, all ratios in exact integer
micro-units (count * 1e6 // n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext25 import (
    _LANG_MARKERS,
    _ORDERED,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SHORT_CHARS = 200


def _lang_sql_fragment() -> tuple[str, str]:
    score_cols = ",\n    ".join(
        f"CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}')) AS BIGINT)"
        f" AS s_{lang}"
        for lang, pat in _LANG_MARKERS.items()
    )
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in _ORDERED) + ")"
    case = " ".join(f"WHEN s_{lg} = {m} THEN '{lg}'" for lg in _ORDERED)
    pred = f"CASE WHEN {m} = 0 THEN 'und' {case} END"
    return score_cols, pred


_SCORE_COLS, _PRED = _lang_sql_fragment()

_SCORECARD_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, lang, n_chars,
         md5(substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                    1, 200)) AS pfp,
    {_SCORE_COLS}
  FROM documents
), pred AS (
  SELECT doc_id, source, lang, n_chars, pfp,
         {_PRED} AS predicted_lang
  FROM scored
), dup_fps AS (
  SELECT pfp FROM pred GROUP BY pfp HAVING count(*) >= 2
), flagged AS (
  SELECT p.source,
         CASE WHEN p.predicted_lang <> p.lang THEN 1 ELSE 0 END AS mism,
         CASE WHEN d.pfp IS NOT NULL THEN 1 ELSE 0 END AS dup,
         CASE WHEN p.n_chars < {_SHORT_CHARS} THEN 1 ELSE 0 END AS short,
         p.n_chars
  FROM pred p LEFT JOIN dup_fps d ON p.pfp = d.pfp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars,
       CAST(sum(mism) * 1000000 // count(*) AS BIGINT) AS lang_mismatch_micro,
       CAST(sum(dup) * 1000000 // count(*) AS BIGINT) AS dup_rate_micro,
       CAST(sum(short) * 1000000 // count(*) AS BIGINT) AS short_rate_micro
FROM flagged GROUP BY source ORDER BY source
"""


@register("source_quality_scorecard", _SCORECARD_ORACLE)
def q_source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health: doc count, mean length, language
    mismatch rate (marker-n-gram detector vs declared lang), prefix-dup
    rate, and short-doc rate — one scan plus a self-join on the bounded
    dup-fingerprint set; every rate an exact integer micro-unit."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5(F.substring(norm, 1, 200)).alias("pfp"),
        *[
            F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"s_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    m = F.greatest(*[F.col(f"s_{lg}") for lg in _ORDERED])
    pred = F.when(m == 0, F.lit("und"))
    for lg in _ORDERED:
        pred = pred.when(F.col(f"s_{lg}") == m, F.lit(lg))
    p = scored.select(
        "source", "lang", "n_chars", "pfp", pred.alias("predicted_lang")
    )
    dup_fps = (
        p.groupBy("pfp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("pfp", F.lit(1).alias("_dup"))
    )
    flagged = p.join(F.broadcast(dup_fps), "pfp", "left").select(
        "source",
        F.when(F.col("predicted_lang") != F.col("lang"), 1)
        .otherwise(0)
        .alias("mism"),
        F.coalesce(F.col("_dup"), F.lit(0)).alias("dup"),
        F.when(F.col("n_chars") < _SHORT_CHARS, 1).otherwise(0).alias("short"),
        "n_chars",
    )
    n = F.count(F.lit(1))
    return (
        flagged.groupBy("source")
        .agg(
            n.cast("bigint").alias("n_docs"),
            # Integer DIV mirrors the oracle's '//' exactly; float floor
            # drifts once sum*1e6 passes ~2^45 (ext90/ext103 rule).
            F.expr("CAST(sum(n_chars) DIV count(1) AS BIGINT)").alias(
                "mean_chars"
            ),
            F.expr(
                "CAST((sum(mism) * 1000000) DIV count(1) AS BIGINT)"
            ).alias("lang_mismatch_micro"),
            F.expr(
                "CAST((sum(dup) * 1000000) DIV count(1) AS BIGINT)"
            ).alias("dup_rate_micro"),
            F.expr(
                "CAST((sum(short) * 1000000) DIV count(1) AS BIGINT)"
            ).alias("short_rate_micro"),
        )
        .orderBy("source")
    )


_SEASONAL_ORACLE = """
WITH hod AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM hod GROUP BY 1
)
SELECT h.event_type, h.hour_of_day, h.n,
       CAST(h.n * 24 * 1000000 // t.total AS BIGINT) AS seasonal_index_micro
FROM hod h JOIN tot t USING (event_type)
ORDER BY event_type, hour_of_day
"""


@register("hour_of_day_seasonal_index", _SEASONAL_ORACLE)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event type: observed/expected under
    uniformity as n * 24 * 1e6 // total (1,000,000 = flat). The index
    frame is 5 x 24 — the capacity-planning curve, integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    hod = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = hod.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("total")
    )
    return (
        hod.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n",
            F.expr("CAST((n * 24 * 1000000) DIV total AS BIGINT)").alias(
                "seasonal_index_micro"
            ),
        )
        .orderBy("event_type", "hour_of_day")
    )


_WKND_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CASE WHEN strftime(ts, '%w') IN ('0', '6') THEN 1 ELSE 0 END
           AS is_weekend,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
  FROM events GROUP BY 1, 2
), piv AS (
  SELECT event_type,
         sum(CASE WHEN is_weekend = 1 THEN n ELSE 0 END) AS we_n,
         sum(CASE WHEN is_weekend = 1 THEN n_days ELSE 0 END) AS we_days,
         sum(CASE WHEN is_weekend = 0 THEN n ELSE 0 END) AS wd_n,
         sum(CASE WHEN is_weekend = 0 THEN n_days ELSE 0 END) AS wd_days
  FROM daily GROUP BY 1
)
SELECT event_type,
       CAST(we_n AS BIGINT) AS weekend_events,
       CAST(we_days AS BIGINT) AS weekend_days,
       CAST(wd_n AS BIGINT) AS weekday_events,
       CAST(wd_days AS BIGINT) AS weekday_days,
       CAST((we_n * wd_days) * 1000000 // NULLIF(wd_n * we_days, 0)
            AS BIGINT) AS weekend_uplift_micro
FROM piv ORDER BY event_type
"""


@register("weekday_weekend_contrast", _WKND_ORACLE)
def q_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend vs weekday per-day event rate contrast per type:
    (weekend events/day) / (weekday events/day) as an exact integer
    micro-ratio via cross-multiplication — no float rates. Day-of-week
    uses the cross-engine rule (DuckDB strftime '%w': 0=Sunday; Spark
    dayofweek: 1=Sunday)."""
    ev = load_table(spark, sf_dir, "events")
    is_we = F.dayofweek("ts").isin(1, 7).cast("int")
    daily = ev.groupBy("event_type", is_we.alias("is_weekend")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct(F.date_trunc("day", F.col("ts")))
        .cast("bigint")
        .alias("n_days"),
    )
    piv = daily.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_weekend") == 1, F.col("n")).otherwise(0)).alias("we_n"),
        F.sum(F.when(F.col("is_weekend") == 1, F.col("n_days")).otherwise(0)).alias("we_days"),
        F.sum(F.when(F.col("is_weekend") == 0, F.col("n")).otherwise(0)).alias("wd_n"),
        F.sum(F.when(F.col("is_weekend") == 0, F.col("n_days")).otherwise(0)).alias("wd_days"),
    )
    return piv.select(
        "event_type",
        F.col("we_n").cast("bigint").alias("weekend_events"),
        F.col("we_days").cast("bigint").alias("weekend_days"),
        F.col("wd_n").cast("bigint").alias("weekday_events"),
        F.col("wd_days").cast("bigint").alias("weekday_days"),
        F.expr(
            "CAST((we_n * wd_days) * 1000000"
            " DIV NULLIF(wd_n * we_days, 0) AS BIGINT)"
        ).alias("weekend_uplift_micro"),
    ).orderBy("event_type")
