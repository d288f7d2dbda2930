"""Extension queries, round 34: three more corpus-curation operators —
chunk-level exact dedup (sub-document boilerplate detection), token-budget
sampling (fixed per-source token quota via the distributed prefix sum),
and an int8 embedding-quantization error audit.

Same determinism contracts as the rest of the package: the hash60 md5
prefix for cross-engine hashes, in-row array-order folds for per-vector
double math, decimal sums for cross-row accumulation, round at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.operators.ranks import (
    with_distributed_prefix_sum,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Chunk-level exact dedup (64/48 stride windows, md5 chunk fingerprints)
# ---------------------------------------------------------------------------

_CHUNK_DEDUP_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), chunks AS (
  SELECT doc_id, source,
         md5(array_to_string(
           list_slice(toks, s.start + 1, s.start + least(64, n_tok - s.start)),
           ' ')) AS chunk_hash
  FROM docs, LATERAL (
    SELECT unnest(generate_series(0, CAST(n_tok - 1 AS BIGINT), 48)) AS start
  ) s
), freq AS (
  SELECT chunk_hash, CAST(count(*) AS BIGINT) AS cnt FROM chunks GROUP BY 1
)
SELECT c.source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT c.chunk_hash) AS BIGINT) AS distinct_chunks,
       CAST(count(*) FILTER (WHERE f.cnt > 1) AS BIGINT) AS dup_chunks,
       round(CAST(count(*) FILTER (WHERE f.cnt > 1) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM chunks c JOIN freq f ON c.chunk_hash = f.chunk_hash
GROUP BY 1 ORDER BY c.source
"""


@register("chunk_dedup_stats", _CHUNK_DEDUP_ORACLE)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: fingerprint every 64-token/48-stride chunk
    (the RefinedWeb/FineWeb-style boilerplate detector grain) and report,
    per source, how many emitted chunks collide with ANY other chunk in
    the corpus. Plan: one in-row chunk explode, a global hash-count
    aggregate (map-side combinable on the uniform md5 key), and a
    co-partitioned join-back on the same hash — both wide stages shuffle
    (hash, count) pairs, never text.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("toks")
    ).withColumn("n_tok", F.size("toks").cast("bigint"))
    chunks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.col("n_tok") - 1, F.lit(48).cast("bigint")
            )
        ).alias("start"),
        "toks",
        "n_tok",
    ).select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    F.col("start") + 1,
                    F.least(F.lit(64), F.col("n_tok") - F.col("start")),
                ),
            )
        ).alias("chunk_hash"),
    )
    freq = chunks.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("cnt"))
    joined = chunks.join(freq, "chunk_hash")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("distinct_chunks"),
            F.count_if(F.col("cnt") > 1).alias("dup_chunks"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.col("dup_chunks").cast("double") / F.col("n_chunks").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Token-budget sampling: fixed per-source token quota, hash-ordered greedy
# ---------------------------------------------------------------------------

_BUDGET = 300

_TOKEN_BUDGET_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS hkey
  FROM documents
), cum AS (
  SELECT *, coalesce(sum(n_tok) OVER (
      PARTITION BY source ORDER BY hkey, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
  FROM docs
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE tok_before < {_BUDGET}) AS BIGINT)
         AS n_selected,
       CAST(sum(n_tok) FILTER (WHERE tok_before < {_BUDGET}) AS BIGINT)
         AS tokens_selected
FROM cum GROUP BY 1 ORDER BY source
"""


@register("token_budget_sample", _TOKEN_BUDGET_ORACLE)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget sampling: each source contributes docs in
    content-hash order until a fixed token quota fills (the doc crossing
    the boundary is kept — greedy fill). This is the mixture-building
    primitive when quotas are TOKENS, not documents (cf. the
    domain_mixture_weights rates, which are per-doc).

    The running token total uses operators/ranks.with_distributed_prefix_sum
    — the bucketed two-phase prefix sum, NO single-partition window — so
    the selection predicate `tokens_before < budget` is a scan-side
    comparison. Partition-count independent and exact (bigint sums).
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        hash60(F.col("doc_id").cast("string")).alias("hkey"),
    )
    cum = with_distributed_prefix_sum(
        docs,
        part_cols=["source"],
        order_cols=["hkey", "doc_id"],
        value_col="n_tok",
        out_col="tok_before",
    )
    sel = F.col("tok_before") < _BUDGET
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(sel).alias("n_selected"),
            F.sum(F.when(sel, F.col("n_tok"))).alias("tokens_selected"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization error audit
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH q AS (
  SELECT label,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale,
         embedding
  FROM embeddings
), err AS (
  SELECT label, scale,
         list_sum(list_transform(embedding,
           x -> (CAST(x AS DOUBLE)
                 - floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)
              * (CAST(x AS DOUBLE)
                 - floor(CAST(x AS DOUBLE) / scale + 0.5) * scale))) AS sse,
         list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)
                    - floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)))
           AS max_abs
  FROM q
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(CAST(sse AS DECIMAL(28,20))) AS DOUBLE)
             / (count(*) * 64), 9) AS mse,
       round(max(max_abs), 6) AS max_abs_err,
       round(CAST(sum(CAST(scale AS DECIMAL(18,12))) AS DOUBLE)
             / count(*), 9) AS avg_scale
FROM err GROUP BY 1 ORDER BY 1
"""


@register("embedding_int8_quant_error", _QUANT_ORACLE)
def q_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector scale = max|x|/127,
    code = floor(x/scale + 0.5) (round-half-up written as floor so both
    engines agree — banker's rounding differs between them), error =
    x - code*scale. Per label: MSE, worst absolute error, average scale —
    the go/no-go numbers for shipping an 4x-smaller ANN index.

    Determinism: all per-vector math is in-row array-order folds (double,
    identical on both engines); cross-row accumulation casts each
    vector's SSE/scale to DECIMAL before summing so partition order can't
    change a bit; one final double division, rounded.
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    x = F.col("x").cast("double")
    scale = (
        F.array_max(F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double"))))
        / F.lit(127.0)
    )
    q = emb.select(
        "label",
        scale.alias("scale"),
        "embedding",
    )
    err_term = lambda v: v.cast("double") - F.floor(
        v.cast("double") / F.col("scale") + F.lit(0.5)
    ) * F.col("scale")
    err = q.select(
        "label",
        "scale",
        F.aggregate(
            F.transform(F.col("embedding"), lambda v: err_term(v) * err_term(v)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sse"),
        F.array_max(
            F.transform(F.col("embedding"), lambda v: F.abs(err_term(v)))
        ).alias("max_abs"),
    )
    return (
        err.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("sse").cast("decimal(28,20)")).cast("double")
                / (F.count(F.lit(1)) * 64),
                9,
            ).alias("mse"),
            F.round(F.max("max_abs"), 6).alias("max_abs_err"),
            F.round(
                F.sum(F.col("scale").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_scale"),
        )
        .orderBy("label")
    )
