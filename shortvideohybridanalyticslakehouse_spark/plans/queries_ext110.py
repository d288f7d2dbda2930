"""Extension queries, round 110: non-parametric trend and rank
statistics — Mann-Kendall trend test + Theil-Sen slope over the daily
event series, and per-language Spearman rank correlation between doc
length and token count (the rank-robust twin of ext109's Pearson).

All rank/sign/slope arithmetic is exact integers (average ranks carried
x2, pairwise slopes in integer micro units via DIV — truncation toward
zero is identical in Spark DIV and DuckDB //, which matters here because
slopes GO NEGATIVE); the only floats are final z/rho ratios of exact
integers, rounded to 6 decimals on both sides (the repo's cross-engine
float convention).

Scale notes: both statistics run over BOUNDED frames (30 daily points
per event type; one rank row per document) — the O(n^2) pair joins are
435 rows per type, broadcast-sized at any SF because the calendar, not
the row count, sets n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_DAILY_CTE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', (SELECT min(date_trunc('day', ts)) FROM events),
                   date_trunc('day', ts)) AS idx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
"""

_MK_ORACLE = (
    _DAILY_CTE
    + """
, pairs AS (
  SELECT a.event_type,
         CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.idx < b.idx
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(coalesce(sum(t * (t-1) * (2*t+5)), 0) AS BIGINT) AS tie18
  FROM (
    SELECT event_type, n, count(*) AS t FROM daily GROUP BY 1, 2
  ) GROUP BY 1
), s AS (
  SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
  FROM pairs GROUP BY 1
)
SELECT b.event_type, b.n_days, s.s_stat,
       CAST(b.n_days * (b.n_days - 1) * (2 * b.n_days + 5) - t.tie18
            AS BIGINT) AS var18,
       round(
         CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
              WHEN s.s_stat < 0 THEN (s.s_stat + 1)
              ELSE 0 END
         / sqrt((b.n_days * (b.n_days - 1) * (2 * b.n_days + 5) - t.tie18)
                / 18.0),
         6) AS z_score
FROM base b JOIN s USING (event_type) JOIN ties t USING (event_type)
ORDER BY event_type
"""
)


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = F.broadcast(
        ev.agg(F.min(F.date_trunc("day", F.col("ts"))).alias("d0"))
    )
    return (
        ev.crossJoin(anchor)
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("d0"))
            .cast("bigint")
            .alias("idx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register("mann_kendall_daily_trend", _MK_ORACLE)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type over the 30-day
    daily series: exact S statistic (sum of pairwise signs), exact
    tie-corrected variance carried x18 as an integer, and the normal
    z-score. The pair join is 435 rows per type — calendar-bounded, so
    broadcast-sized at any SF."""
    daily = _daily(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("idx").alias("i"), F.col("n").alias("na")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("idx").alias("j"),
        F.col("n").alias("nb"),
    )
    sg = (
        F.when(F.col("nb") > F.col("na"), 1)
        .when(F.col("nb") < F.col("na"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            F.broadcast(b),
            (F.col("event_type") == F.col("et2")) & (F.col("i") < F.col("j")),
        )
        .groupBy("event_type")
        .agg(F.sum(sg).cast("bigint").alias("s_stat"))
    )
    base = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie18")
    ).cast("bigint")
    s_adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(F.lit(0))
    )
    return (
        base.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.round(
                s_adj / F.sqrt(var18.cast("double") / 18.0), 6
            ).alias("z_score"),
        )
        .orderBy("event_type")
    )


_TS_ORACLE = (
    _DAILY_CTE
    + """
, slopes AS (
  SELECT a.event_type,
         CAST(((b.n - a.n) * 1000000) // (b.idx - a.idx) AS BIGINT) AS sl
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.idx < b.idx
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(list_sort(list(sl))[(count(*) + 1) // 2] AS BIGINT)
         AS median_slope_micro,
       CAST(min(sl) AS BIGINT) AS min_slope_micro,
       CAST(max(sl) AS BIGINT) AS max_slope_micro
FROM slopes GROUP BY 1 ORDER BY event_type
"""
)


@register("theil_sen_daily_slope", _TS_ORACLE)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per event type: lower median of all
    pairwise daily-count slopes in integer micro-events/day. DuckDB //
    and Spark DIV both truncate toward zero, so the NEGATIVE slopes this
    series produces replay exactly (the round-6 DIV-family rule)."""
    daily = _daily(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("idx").alias("i"), F.col("n").alias("na")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("idx").alias("j"),
        F.col("n").alias("nb"),
    )
    slopes = a.join(
        F.broadcast(b),
        (F.col("event_type") == F.col("et2")) & (F.col("i") < F.col("j")),
    ).select(
        "event_type",
        F.expr("CAST(((nb - na) * 1000000) DIV (j - i) AS BIGINT)").alias(
            "sl"
        ),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr(
                "CAST(element_at(array_sort(collect_list(sl)),"
                " CAST((count(1) + 1) DIV 2 AS INT)) AS BIGINT)"
            ).alias("median_slope_micro"),
            F.min("sl").cast("bigint").alias("min_slope_micro"),
            F.max("sl").cast("bigint").alias("max_slope_micro"),
        )
        .orderBy("event_type")
    )


_SPEARMAN_ORACLE = r"""
WITH per_doc AS (
  SELECT lang,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
              AS BIGINT) AS y
  FROM documents
), ranked AS (
  SELECT lang, x, y,
         2 * rank() OVER (PARTITION BY lang ORDER BY x)
           + count(*) OVER (PARTITION BY lang, x) - 1 AS xr2,
         2 * rank() OVER (PARTITION BY lang ORDER BY y)
           + count(*) OVER (PARTITION BY lang, y) - 1 AS yr2
  FROM per_doc
), sums AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xr2) AS BIGINT) AS sx, CAST(sum(yr2) AS BIGINT) AS sy,
         CAST(sum(xr2 * xr2) AS BIGINT) AS sxx,
         CAST(sum(yr2 * yr2) AS BIGINT) AS syy,
         CAST(sum(xr2 * yr2) AS BIGINT) AS sxy
  FROM ranked GROUP BY 1
)
SELECT lang, n,
       round((n * sxy - sx * sy)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
             6) AS spearman_rho
FROM sums ORDER BY lang
"""


@register("doc_length_token_spearman", _SPEARMAN_ORACLE)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Spearman rank correlation between n_chars and
    whitespace token count — the rank-robust twin of ext109's Pearson
    (outlier-heavy langs can fake a high Pearson). Average ranks for
    ties are carried x2 (2*min_rank + tie_count - 1: exact integers),
    so the only float is the final rho ratio of exact bigint moments,
    computed as sqrt(a)*sqrt(b) in BOTH engines."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("y"),
    )
    wx = Window.partitionBy("lang").orderBy("x")
    wy = Window.partitionBy("lang").orderBy("y")
    ranked = per_doc.select(
        "lang",
        (
            2 * F.rank().over(wx)
            + F.count(F.lit(1)).over(Window.partitionBy("lang", "x"))
            - 1
        ).cast("bigint").alias("xr2"),
        (
            2 * F.rank().over(wy)
            + F.count(F.lit(1)).over(Window.partitionBy("lang", "y"))
            - 1
        ).cast("bigint").alias("yr2"),
    )
    sums = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xr2").cast("bigint").alias("sx"),
        F.sum("yr2").cast("bigint").alias("sy"),
        F.sum(F.col("xr2") * F.col("xr2")).cast("bigint").alias("sxx"),
        F.sum(F.col("yr2") * F.col("yr2")).cast("bigint").alias("syy"),
        F.sum(F.col("xr2") * F.col("yr2")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        "lang",
        "n",
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("spearman_rho"),
    ).orderBy("lang")
