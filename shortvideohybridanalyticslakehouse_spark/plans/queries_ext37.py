"""Extension queries, round 37: training-export surface — the packed-
sequence MANIFEST (the per-document chunk/offset mapping a trainer
actually consumes; concat_chunk_packing_plan is its aggregate audit) and
an OOV-rate audit against a corpus-derived vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_CHUNK = 2048

_MANIFEST_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id,
       CAST(cum_before // {_CHUNK} AS BIGINT) AS chunk_id,
       CAST(cum_before % {_CHUNK} AS BIGINT) AS chunk_offset,
       n_tok,
       (cum_before // {_CHUNK}) <> ((cum_before + n_tok - 1) // {_CHUNK})
         AS spans_boundary
FROM c ORDER BY chunk_id, chunk_offset
"""


@register("packed_sequence_manifest", _MANIFEST_ORACLE)
def q_packed_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The concat-and-chunk EXPORT mapping for sequence length 2048: for
    every document (in the deterministic content-hash shuffle order) the
    chunk it starts in, its token offset inside that chunk, and whether
    it straddles a boundary (the rows document-masked attention needs).
    Same distributed prefix sum as the packing audit
    (operators/ranks.with_distributed_prefix_sum — no single-partition
    window); the manifest is pure arithmetic on the exclusive cumsum, so
    a writer can partition output files BY chunk range directly.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    t = docs.select(
        "doc_id",
        hash60(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    c = ranks.with_distributed_prefix_sum(
        t,
        part_cols=[],
        order_cols=["h", "doc_id"],
        value_col="n_tok",
        single_pass=True,
        out_col="cum_before",
    )
    chunk = F.lit(_CHUNK)
    return (
        c.select(
            "doc_id",
            F.expr(f"cum_before DIV {_CHUNK}").alias("chunk_id"),
            (F.col("cum_before") % chunk).cast("bigint").alias("chunk_offset"),
            "n_tok",
            (
                F.expr(f"cum_before DIV {_CHUNK}")
                != F.expr(f"(cum_before + n_tok - 1) DIV {_CHUNK}")
            ).alias("spans_boundary"),
        )
        .orderBy("chunk_id", "chunk_offset")
    )


_OOV_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
), vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY n DESC, token ASC) AS rn
    FROM freq) WHERE rn <= 100
)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS tokens,
       CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS oov_tokens,
       round(CAST(count(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v ON t.token = v.token
GROUP BY 1 ORDER BY t.source
"""


@register("oov_rate_by_source", _OOV_ORACLE)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus's own top-100
    token vocabulary — the tokenizer-fit audit (high per-source OOV =
    that source's text will fragment into long byte-level sequences).
    Vocabulary ranking via the distributed exact ranker (no global sort);
    the vocab is O(100) rows, broadcast into the token-stream left join,
    which partial-aggregates per source map-side.
    """
    tok = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        ranks.with_distributed_row_number(
            freq.withColumn("neg_n", -F.col("n")), [], ["neg_n", "token"],
            single_pass=True,
        )
        .filter(F.col("_rn") <= 100)
        .select(F.col("token").alias("v_token"))
    )
    joined = tok.join(
        F.broadcast(vocab), tok.token == F.col("v_token"), "left"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("tokens"),
            F.count_if(F.col("v_token").isNull()).alias("oov_tokens"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("oov_tokens").cast("double") / F.col("tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )
