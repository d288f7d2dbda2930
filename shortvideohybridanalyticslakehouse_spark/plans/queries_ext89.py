"""Extension queries, round 89: Zipf rank-frequency fit — the corpus
statistic (slope of ln(freq) against ln(rank) for the top terms) a text
pipeline tracks to detect template pollution or tokenizer breakage (a
natural corpus sits near slope -1; boilerplate floods flatten the head).

OLS over the 100 (ln rank, ln freq) points is computed from ORDERED
array folds (four moment sums over the identical value sequence in both
engines — float addition stays order-pinned), after a total-order top-k
(freq DESC, term ASC) whose ranks are positions in that same order.
Everything upstream of the 100-element array is exact-integer term
counting; TakeOrderedAndProject keeps the vocab sort distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TOP = 100

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
), freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
), top AS (
  SELECT c FROM freq ORDER BY c DESC, term ASC LIMIT {_TOP}
), packed AS (
  SELECT list(CAST(c AS DOUBLE) ORDER BY c DESC) AS cs,
         CAST(count(*) AS BIGINT) AS n
  FROM top
), moments AS (
  SELECT n,
    list_reduce(list_transform(range(1, CAST(n AS INT) + 1),
      r -> ln(CAST(r AS DOUBLE))), (a, b) -> a + b) AS sx,
    list_reduce(list_transform(range(1, CAST(n AS INT) + 1),
      r -> ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))),
      (a, b) -> a + b) AS sxx,
    list_reduce(list_transform(cs, c -> ln(c)), (a, b) -> a + b) AS sy,
    list_reduce(list_transform(range(1, CAST(n AS INT) + 1),
      r -> ln(CAST(r AS DOUBLE)) * ln(cs[CAST(r AS INT)])),
      (a, b) -> a + b) AS sxy
  FROM packed
)
SELECT n AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept
FROM moments
"""


@register("zipf_rank_frequency_fit", _ZIPF_ORACLE)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept of ln(freq) vs ln(rank) over the top-100
    terms; moment sums via ordered array folds (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    top = freq.orderBy(F.col("c").desc(), F.col("term").asc()).limit(_TOP)
    packed = top.agg(
        F.reverse(F.array_sort(F.collect_list(F.col("c").cast("double"))))
        .alias("cs"),
        F.count(F.lit(1)).alias("n"),
    )

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)

    ranks = F.sequence(F.lit(1), F.col("n").cast("int"))
    lnr = F.transform(ranks, lambda r: F.log(r.cast("double")))
    sx = fold(lnr)
    sxx = fold(F.transform(ranks, lambda r: F.log(r.cast("double")) * F.log(r.cast("double"))))
    sy = fold(F.transform(F.col("cs"), lambda c: F.log(c)))
    sxy = fold(
        F.transform(
            ranks,
            lambda r: F.log(r.cast("double"))
            * F.log(F.element_at(F.col("cs"), r.cast("int"))),
        )
    )
    n = F.col("n")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return packed.select(
        n.alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )
