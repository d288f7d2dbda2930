"""Extension queries, round 127: Burrows' Delta (Burrows 2002; Evert et
al. 2017) — the standard stylometric distance between text collections,
used for authorship attribution and (in a data pipeline) for detecting
that two "different" sources are actually the same generator.

Per source s and top-K corpus term t: the relative frequency
f(s,t) = (cnt_st * 1e6) DIV n_s (integer micro). Across the sources,
each term's spread is the population variance of those integers
(Huygens: S * sum(f^2) - (sum f)^2 over exact ints, S = #sources).
Delta between sources a and b is the mean standardized difference

    delta(a,b) = (1/K') * sum over terms of |f_a - f_b| / sd_t

Determinism contract: every per-term contribution is floored to micro
units BEFORE summation — contrib = floor(|f_a - f_b| * S * 1e6 /
sqrt(var_num)) with var_num the exact integer S*sum(f^2)-(sum f)^2 and
ONE sqrt+divide in doubles (identical IEEE both engines) — so the
per-pair rollup is an exact integer sum, order-free (the ext92/ext120
micro discipline). Zero-variance terms are excluded (K' counts the
rest, reported per pair).

Plan shape for 100 TB: one tokenize+count to O(sources x vocab), a
broadcast-able top-K term table, and an O(sources^2 x K) bounded pair
join — corpus size touches only the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_K = 30

_DELTA_ORACLE = f"""
WITH tok AS (
  SELECT source,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
), st AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
), stot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1
), topk AS (
  SELECT term FROM st GROUP BY term
  ORDER BY sum(c) DESC, term ASC LIMIT {_K}
), grid AS (
  SELECT s.source, t.term, s.n FROM stot s CROSS JOIN topk t
), fmat AS (
  SELECT g.source, g.term,
         CAST(coalesce(st.c, 0) * 1000000 // g.n AS BIGINT) AS f
  FROM grid g LEFT JOIN st ON st.source = g.source AND st.term = g.term
), spread AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS s_cnt,
         CAST(count(*) * sum(CAST(f AS HUGEINT) * f)
              - CAST(sum(f) AS HUGEINT) * sum(f) AS HUGEINT) AS var_num
  FROM fmat GROUP BY 1
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.term,
         abs(a.f - b.f) AS adiff, sp.var_num, sp.s_cnt
  FROM fmat a
  JOIN fmat b ON a.term = b.term AND a.source < b.source
  JOIN spread sp ON sp.term = a.term
  WHERE sp.var_num > 0
), contrib AS (
  SELECT src_a, src_b,
         CAST(floor(CAST(adiff AS DOUBLE) * s_cnt * 1000000
                    / sqrt(CAST(var_num AS DOUBLE))) AS BIGINT) AS c
  FROM pairs
)
SELECT src_a, src_b,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(c) // count(*) AS BIGINT) AS delta_micro
FROM contrib GROUP BY 1, 2
"""


@register("burrows_delta_sources", _DELTA_ORACLE)
def q_burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair over the top-30 corpus
    terms: per-term micro-quantized standardized differences, exact
    integer mean per pair."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stot = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    topk = (
        st.groupBy("term")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("term").asc())
        .limit(_K)
        .select("term")
    )
    grid = stot.crossJoin(F.broadcast(topk))
    fmat = grid.join(st, ["source", "term"], "left").select(
        "source",
        "term",
        F.expr(
            "CAST(coalesce(c, 0) * 1000000 DIV n AS BIGINT)"
        ).alias("f"),
    )
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    spread = fmat.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt"),
        (
            F.count(F.lit(1)) * F.sum(d38(F.col("f") * F.col("f")))
            - F.sum(d38(F.col("f"))) * F.sum(d38(F.col("f")))
        ).alias("var_num"),
    )
    a = fmat.select(
        F.col("source").alias("src_a"), "term", F.col("f").alias("fa")
    )
    b = fmat.select(
        F.col("source").alias("src_b"), "term", F.col("f").alias("fb")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(spread), "term")
        .filter(F.col("var_num") > 0)
    )
    contrib = pairs.select(
        "src_a",
        "src_b",
        F.floor(
            F.abs(F.col("fa") - F.col("fb")).cast("double")
            * F.col("s_cnt")
            * F.lit(1000000.0)
            / F.sqrt(F.col("var_num").cast("double"))
        )
        .cast("bigint")
        .alias("c"),
    )
    return contrib.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.expr("CAST(sum(c) DIV count(1) AS BIGINT)").alias("delta_micro"),
    )
