"""Extension queries, round 32: training-corpus curation additions —
SemDeDup semantic dedup (embedding-cluster prune), sliding-window document
chunking, vocabulary coverage curve — plus grouped OLS regression
aggregates (regr_slope family) done with exact moment sums.

Reference analogs: the corpus-hygiene surface grown around SURVEY.md §2's
documents/embeddings tables (same family as dedupfns/minhash and the
quality-filter funnel). Determinism discipline: integral/decimal exact
aggregation, ONE final double expression written identically in the Spark
plan and the DuckDB oracle, round at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic near-duplicate pruning
# ---------------------------------------------------------------------------

_SQ_L2 = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)
_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 6)"
)

_SEMDEDUP_ORACLE = f"""
WITH med AS (
  SELECT vec_id AS cell_id, embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 16
), dist AS (
  SELECT e.vec_id, e.embedding, m.cell_id,
         {_SQ_L2.format(a='e.embedding', b='m.embedding')} AS d2
  FROM embeddings e CROSS JOIN med m
), assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY d2, cell_id) AS rn
    FROM dist)
  WHERE rn = 1
), dropped AS (
  SELECT a.cell_id, CAST(count(DISTINCT b.vec_id) AS BIGINT) AS n_dropped
  FROM assigned a
  JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.30
  GROUP BY 1
), members AS (
  SELECT cell_id, CAST(count(*) AS BIGINT) AS n_members FROM assigned GROUP BY 1
)
SELECT CAST(m.cell_id AS BIGINT) AS cell_id, m.n_members,
       m.n_members - coalesce(d.n_dropped, 0) AS n_kept,
       coalesce(d.n_dropped, 0) AS n_dropped
FROM members m LEFT JOIN dropped d ON m.cell_id = d.cell_id
ORDER BY cell_id
"""


@register("semdedup_cluster_prune", _SEMDEDUP_ORACLE)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (public arXiv:2303.09540) over the embeddings corpus:
    deterministic medoid cells, within-cell cosine >= 0.30 prune keeping
    the smallest id. See similarity.semdedup_prune for the scale notes
    (scan-side argmin assignment, per-cell self-join, n_cells grows with
    corpus so cell populations stay bounded).
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    return similarity.semdedup_prune(emb, n_cells=16, tau=0.30)


# ---------------------------------------------------------------------------
# Sliding-window document chunking (size 64, stride 48)
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), chunks AS (
  SELECT doc_id, source, n_tok,
         least(64, n_tok - s.start) AS chunk_len
  FROM docs, LATERAL (
    SELECT unnest(generate_series(0, CAST(n_tok - 1 AS BIGINT), 48)) AS start
  ) s
), per_doc AS (
  SELECT doc_id, source, max(n_tok) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(chunk_len) AS BIGINT) AS chunk_tokens,
         CAST(count(*) FILTER (WHERE chunk_len = 64) AS BIGINT) AS full_chunks
  FROM chunks GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS chunk_tokens,
       CAST(sum(chunk_tokens - n_tok) AS BIGINT) AS overlap_tokens,
       CAST(sum(full_chunks) AS BIGINT) AS full_chunks
FROM per_doc GROUP BY 1 ORDER BY source
"""


@register("doc_chunk_overlap_plan", _CHUNK_ORACLE)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking audit: every document split into size-64
    token windows at stride 48 (16-token overlap — the standard RAG /
    pretraining chunker), accounted per source: chunks emitted, tokens
    after duplication, overlap (double-counted) tokens, full-window share.

    The chunk grid is `sequence(0, n_tok-1, 48)` exploded IN-ROW — a
    generator expression, no join, no UDF; per-doc then per-source
    aggregation both partial-aggregate map-side. At 100 TB the explode
    fan-out is the unavoidable output size (~n_tok/48 rows per doc), and
    everything downstream of it is map-side combinable.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    chunks = docs.select(
        "doc_id",
        "source",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_tok") - 1, F.lit(48).cast("bigint"))
        ).alias("start"),
    ).withColumn("chunk_len", F.least(F.lit(64), F.col("n_tok") - F.col("start")))
    per_doc = chunks.groupBy("doc_id", "source").agg(
        F.max("n_tok").alias("n_tok"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").alias("chunk_tokens"),
        F.count_if(F.col("chunk_len") == 64).alias("full_chunks"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("chunk_tokens").alias("chunk_tokens"),
            F.sum(F.col("chunk_tokens") - F.col("n_tok")).alias("overlap_tokens"),
            F.sum("full_chunks").alias("full_chunks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (coverage@k over the token frequency ranking)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rn FROM freq
)
SELECT CAST(ks.k AS BIGINT) AS k,
       round(CAST(sum(CASE WHEN rn <= ks.k THEN n ELSE 0 END) AS DOUBLE)
             / CAST((SELECT sum(n) FROM freq) AS DOUBLE), 6) AS coverage
FROM ranked CROSS JOIN (VALUES (10), (25), (50), (100), (250)) ks(k)
GROUP BY 1 ORDER BY 1
"""


@register("vocab_coverage_curve", _VOCAB_ORACLE)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing diagnostic: what share of all token occurrences do
    the top-k vocabulary entries cover, for k in {10,25,50,100,250}.

    Ranking uses operators/ranks.with_distributed_row_number on
    (-freq, token) — the exact global frequency rank WITHOUT a
    single-partition sort (the vocab table is O(distinct tokens); at web
    scale that is millions of rows, which is exactly the input the
    bucketed two-phase ranker exists for). Coverage is then 5 conditional
    sums over the ranked vocab in ONE aggregate, divided by the corpus
    token total computed from the same frequency table (no second scan of
    documents).
    """
    ks = [10, 25, 50, 100, 250]
    tok = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    ranked = ranks.with_distributed_row_number(
        freq.withColumn("neg_n", -F.col("n")), [], ["neg_n", "token"],
        single_pass=True,
    )
    total = freq.agg(F.sum("n").alias("t"))
    one = ranked.crossJoin(F.broadcast(total)).agg(
        F.max("t").alias("t"),
        *[
            F.sum(F.when(F.col("_rn") <= k, F.col("n")).otherwise(F.lit(0))).alias(
                f"s{k}"
            )
            for k in ks
        ],
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("bigint").alias("k"),
                    F.round(
                        F.col(f"s{k}").cast("double") / F.col("t").cast("double"), 6
                    ).alias("coverage"),
                )
                for k in ks
            ]
        )
    )
    return one.select(pairs.alias("p")).select("p.k", "p.coverage").orderBy("k")


# ---------------------------------------------------------------------------
# Grouped OLS regression (regr_slope family) via exact moment sums
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts)
             AS DECIMAL(18,0))) AS sx,
         sum(CAST(value AS DECIMAL(18,2))) AS sy,
         sum(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts)
             AS DECIMAL(18,0))
             * CAST(value AS DECIMAL(18,2))) AS sxy,
         sum(CAST(date_diff('second', TIMESTAMP '2024-01-01', ts)
             AS DECIMAL(18,0))
             * CAST(date_diff('second', TIMESTAMP '2024-01-01', ts)
             AS DECIMAL(18,0))) AS sxx
  FROM events GROUP BY 1
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) * 1e6, 6)
         AS slope_per_megasec,
       round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
FROM m ORDER BY event_type
"""


@register("event_value_regr_slope", _REGR_ORACLE)
def q_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend (value vs time): the regr_slope /
    regr_intercept aggregate family. Native regr_* accumulates doubles in
    partition order (non-deterministic across runs AND engines), so the
    five moments (n, Σx, Σy, Σxy, Σx²) are summed EXACTLY — bigint /
    decimal, reassociation-safe — in one map-side-combinable aggregate,
    and the slope/intercept are each ONE double expression written
    identically in both engines. x is epoch seconds from a fixed anchor
    (small magnitudes keep the decimal widths bounded); slope reported
    per megasecond to land in a readable range.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.col("ts").cast("long")
            - F.lit("2024-01-01 00:00:00").cast("timestamp").cast("long")
        )
        .cast("decimal(18,0)")
        .alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    sxy_d = F.col("sxy").cast("double")
    sxx_d = F.col("sxx").cast("double")
    slope = (n_d * sxy_d - sx_d * sy_d) / F.nullif(
        n_d * sxx_d - sx_d * sx_d, F.lit(0.0)
    )
    return m.select(
        "event_type",
        "n",
        F.round(slope * F.lit(1e6), 6).alias("slope_per_megasec"),
        F.round((sy_d - slope * sx_d) / n_d, 6).alias("intercept"),
    ).orderBy("event_type")
