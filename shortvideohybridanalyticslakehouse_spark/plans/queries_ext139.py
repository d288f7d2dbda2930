"""Extension queries, round 139: four profile/tail lanes.

1. ttr_hapax_profile — lexical-diversity profile per source: type-token
   ratio and hapax-legomena share (the vocabulary-health numbers every
   corpus datasheet carries). Exact integer counts, micro ratios via
   integer DIV.
2. cvar_expected_shortfall — CVaR / expected shortfall per event_type:
   the mean of the worst 5% of values (ceil-rank tail boundary, exact
   DECIMAL sum over the tail, one division floored to micro) — the
   tail-risk number a mean hides.
3. tukey_outlier_rate — classic Tukey-fence outlier share per
   event_type: exact Q1/Q3 order statistics (ceil-rank), fences at
   1.5 IQR in pure cent integers, outlier counts and micro rate.
4. bigram_conditional_entropy — H(next token | token) per source over
   text bigrams (the sequence-predictability number for text, the
   document analog of transition_entropy_by_state): per-bigram terms
   nano-floored, exact sums; O(vocab) joins shuffle_hash-pinned.

Plan shapes at 100 TB: TTR/hapax are token-grain aggregations; CVaR and
Tukey are per-type windows over per-type partitions; bigram entropy is
one explode + two count aggregations + a shuffle-hash join on the
(source, token) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TTR_ORACLE = """
WITH occ AS (
  SELECT source, unnest(string_split(trim(lower(coalesce(text, ''))), ' '))
           AS tok
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM occ GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_micro,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS hapax_share_micro
FROM counts GROUP BY 1
"""


@register("ttr_hapax_profile", _TTR_ORACLE)
def q_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio and hapax share per source, integer micro."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    occ = docs.filter(F.length(text) > 0).select(
        "source", F.explode(F.split(text, " ", -1)).alias("tok")
    )
    counts = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "CAST(count(1) * 1000000 DIV sum(c) AS BIGINT)"
        ).alias("ttr_micro"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(1) AS BIGINT)"
        ).alias("hapax_share_micro"),
    )


_CVAR_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents DESC, cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST((max(n) * 5 + 99) // 100 AS BIGINT) AS n_tail,
       CAST(sum(CASE WHEN rn <= (n * 5 + 99) // 100 THEN cents END)
            AS BIGINT) AS tail_cents_sum,
       CAST(sum(CASE WHEN rn <= (n * 5 + 99) // 100 THEN cents END)
            * 1000000 // ((max(n) * 5 + 99) // 100) AS BIGINT)
         AS cvar_cents_micro
FROM ranked GROUP BY 1
"""


@register("cvar_expected_shortfall", _CVAR_ORACLE)
def q_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall: mean of the worst (largest) 5% of values per
    event_type — ceil-rank tail, exact cent integers."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        F.floor(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    win = Window.partitionBy("event_type").orderBy(F.col("cents").desc())
    cnt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    tail = F.expr("(n * 5 + 99) DIV 100")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.expr("CAST((max(n) * 5 + 99) DIV 100 AS BIGINT)").alias("n_tail"),
        F.sum(F.when(F.col("rn") <= tail, F.col("cents")))
        .cast("bigint")
        .alias("tail_cents_sum"),
        F.expr(
            "CAST(sum(CASE WHEN rn <= (n * 5 + 99) DIV 100 THEN cents END)"
            " * 1000000 DIV ((max(n) * 5 + 99) DIV 100) AS BIGINT)"
        ).alias("cvar_cents_micro"),
    )


_TUKEY_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), quartiles AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n_events,
         CAST(max(CASE WHEN rn = (n * 25 + 99) // 100 THEN cents END)
              AS BIGINT) AS q1,
         CAST(max(CASE WHEN rn = (n * 75 + 99) // 100 THEN cents END)
              AS BIGINT) AS q3
  FROM ranked GROUP BY 1
), fenced AS (
  SELECT q.event_type, q.n_events, q.q1, q.q3,
         CAST(sum(CASE WHEN e.cents * 2 < q.q1 * 2 - 3 * (q.q3 - q.q1)
                         OR e.cents * 2 > q.q3 * 2 + 3 * (q.q3 - q.q1)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM ev e JOIN quartiles q ON q.event_type = e.event_type
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, n_events, q1 AS q1_cents, q3 AS q3_cents, n_outliers,
       CAST(n_outliers * 1000000 // n_events AS BIGINT) AS outlier_micro
FROM fenced
"""


@register("tukey_outlier_rate", _TUKEY_ORACLE)
def q_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey 1.5-IQR fence outlier share per event_type — doubled-cent
    integer fences (2x both sides so 1.5*IQR stays integral)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        F.floor(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    win = Window.partitionBy("event_type").orderBy("cents")
    cnt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    quart = ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 25 + 99) DIV 100"),
                   F.col("cents"))
        )
        .cast("bigint")
        .alias("q1"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 75 + 99) DIV 100"),
                   F.col("cents"))
        )
        .cast("bigint")
        .alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        ev.join(quart, "event_type")  # closed event_type alphabet
        .select(
            "event_type",
            "n_events",
            "q1",
            "q3",
            F.when(
                (F.col("cents") * 2 < F.col("q1") * 2 - 3 * iqr)
                | (F.col("cents") * 2 > F.col("q3") * 2 + 3 * iqr),
                1,
            )
            .otherwise(0)
            .alias("is_out"),
        )
        .groupBy("event_type", "n_events", "q1", "q3")
        .agg(F.sum("is_out").cast("bigint").alias("n_outliers"))
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("q1").alias("q1_cents"),
        F.col("q3").alias("q3_cents"),
        "n_outliers",
        F.expr(
            "CAST(n_outliers * 1000000 DIV n_events AS BIGINT)"
        ).alias("outlier_micro"),
    )


_BIGRAM_H_ORACLE = """
WITH toks AS (
  SELECT source, string_split(trim(lower(coalesce(text, ''))), ' ') AS ts
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), bi AS (
  SELECT source, ts[i] AS v, ts[i + 1] AS w
  FROM (
    SELECT source, ts, unnest(generate_series(1, len(ts) - 1)) AS i
    FROM toks WHERE len(ts) >= 2
  )
), bc AS (
  SELECT source, v, w, CAST(count(*) AS BIGINT) AS c
  FROM bi GROUP BY 1, 2, 3
), vc AS (
  SELECT source, v, CAST(sum(c) AS BIGINT) AS cv FROM bc GROUP BY 1, 2
)
SELECT b.source,
       CAST(sum(b.c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(sum(CAST(floor(
         -(CAST(b.c AS DOUBLE) / t.n_tot)
         * ln(CAST(b.c AS DOUBLE) / v.cv) * 1000000000.0
       ) AS BIGINT)) AS BIGINT) AS cond_entropy_nano
FROM bc b
JOIN vc v ON v.source = b.source AND v.v = b.v
JOIN (SELECT source, CAST(sum(c) AS BIGINT) AS n_tot FROM bc GROUP BY 1) t
  ON t.source = b.source
GROUP BY 1
"""


@register("bigram_conditional_entropy", _BIGRAM_H_ORACLE)
def q_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H(next token | token) per source: -sum p(v,w) ln p(w|v) with
    nano-floored per-bigram terms, exact integer sums."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.filter(F.length(text) > 0).select(
        "source", F.split(text, " ", -1).alias("ts")
    )
    bi = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS v,"
                    " element_at(ts, i + 1) AS w))"
                )
            ).alias("p"),
        )
        .select("source", "p.v", "p.w")
    )
    bc = bi.groupBy("source", "v", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    vc = bc.groupBy("source", "v").agg(
        F.sum("c").cast("bigint").alias("cv")
    )
    tot = bc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tot")
    )
    term = F.floor(
        -(F.col("c").cast("double") / F.col("n_tot"))
        * F.log(F.col("c").cast("double") / F.col("cv"))
        * 1_000_000_000.0
    ).cast("bigint")
    return (
        # vc is O(vocab) per source — grows with the corpus: pin
        # shuffle_hash (r9 probe: misestimated count-join broadcasts
        # never demote); tot is O(sources), bounded
        bc.join(vc.hint("shuffle_hash"), ["source", "v"])
        .join(tot, "source")
        .select("source", "c", term.alias("term_nano"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
            F.sum("term_nano").cast("bigint").alias("cond_entropy_nano"),
        )
    )
