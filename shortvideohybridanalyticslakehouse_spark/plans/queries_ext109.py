"""Extension queries, round 109: item revenue merchandising view (the
recsys family's money column) and the per-language length/token Pearson
correlation (tokenizer-fertility sanity: is n_chars a usable proxy for
token budget in every language?). Exact integer moments; one
cast-divide-round per output."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_ITEM_REVENUE_ORACLE = """
WITH purchases AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         user_id
  FROM events
  WHERE event_type = 'purchase' AND json_extract(props, '$.k') IS NOT NULL
), tot AS (
  SELECT CAST(sum(cents) AS BIGINT) AS total FROM purchases
)
SELECT p.item,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_buyers,
       CAST(sum(p.cents) AS BIGINT) AS revenue_cents,
       CAST(sum(p.cents) * 1000000 // t.total AS BIGINT)
         AS revenue_share_micro
FROM purchases p, tot t
GROUP BY p.item, t.total
ORDER BY revenue_cents DESC, p.item ASC
LIMIT 20
"""


@register("item_revenue_topk", _ITEM_REVENUE_ORACLE)
def q_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 items by exact purchase revenue with buyer counts and
    integer revenue share — the merchandising table the co-visitation
    candidates feed."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "user_id",
    ).filter(F.col("item").isNotNull())
    tot = F.broadcast(
        purchases.agg(F.sum("cents").cast("bigint").alias("total"))
    )
    return (
        purchases.crossJoin(tot)
        .groupBy("item", "total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "item",
            "n_purchases",
            "n_buyers",
            "revenue_cents",
            F.expr(
                "CAST((revenue_cents * 1000000) DIV total AS BIGINT)"
            ).alias("revenue_share_micro"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("item"))
        .limit(20)
    )


_LEN_TOKEN_CORR_ORACLE = r"""
WITH per_doc AS (
  SELECT lang,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
              AS BIGINT) AS y
  FROM documents
), mom AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(y * y) AS syy
  FROM per_doc GROUP BY 1
)
SELECT lang, n,
       CAST(sx AS BIGINT) AS sum_chars, CAST(sy AS BIGINT) AS sum_tokens,
       round(CAST(sy AS DOUBLE) * 1000 / CAST(sx AS DOUBLE), 6)
         AS tokens_per_kchar,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
FROM mom ORDER BY lang
"""


@register("doc_length_token_correlation", _LEN_TOKEN_CORR_ORACLE)
def q_len_token_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation between character count and
    whitespace-token count, plus tokens-per-kchar fertility — exact
    integer moments (HUGEINT/DECIMAL(38,0) products), one sqrt+divide."""
    from shortvideohybridanalyticslakehouse_spark.functions import text

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("x"),
        text.token_count(F.col("text")).cast("bigint").alias("y"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y"))).alias("sy"),
        F.sum(d38(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(d38(F.col("y") * F.col("y"))).alias("syy"),
    )
    dd = lambda c: c.cast("double")  # noqa: E731
    return mom.select(
        "lang",
        "n",
        F.col("sx").cast("bigint").alias("sum_chars"),
        F.col("sy").cast("bigint").alias("sum_tokens"),
        F.round(dd(F.col("sy")) * 1000 / dd(F.col("sx")), 6).alias(
            "tokens_per_kchar"
        ),
        F.round(
            dd(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                dd(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * dd(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("pearson_r"),
    ).orderBy("lang")
