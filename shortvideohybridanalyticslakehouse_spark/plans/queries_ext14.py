"""Extension queries, round 14: corpus-curation operators a training-data
pipeline runs before any tokens reach a trainer — domain mixture
reweighting, train/test contamination detection, duplicate-span mining,
concat-and-chunk packing audit, and a corpus novelty (saturation) curve.

All five ride the SAME cross-engine determinism contracts as the dedup
stack: `hash60` (md5-prefix bigint) for splits/ordering and
`dedupfns.shingles` / `_duck_shingles` for 8-gram spans, so every result
is hash-checked against DuckDB. No reference analog (the reference stops
at event analytics, SURVEY.md §2); these extend the training-pipeline
surface the brief makes first-class.

Scale notes are per-query; the only global-window user (packing plan)
documents its two-phase prefix-sum upgrade path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import (  # noqa: F401
    _duck_shingles,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_HASH60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _tokens(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


# ---------------------------------------------------------------------------
# Domain mixture reweighting
# ---------------------------------------------------------------------------

# Token-weighted uniform target: every source should contribute
# total_tokens / n_sources; oversized sources get rate < 1, undersized
# are capped at 1 (we never oversample). Two tiny aggs + a 1-row anchor
# crossJoin — the per-source table is O(sources) regardless of corpus
# size, and the rate division happens once on exact BIGINT totals so
# both engines produce the identical IEEE double.
_MIXTURE_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
), anchor AS (
  SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per_src
)
SELECT
  source, n_docs, src_tokens,
  round(least(1.0, (CAST(total_tokens AS DOUBLE) / n_sources)
                   / CAST(src_tokens AS DOUBLE)), 6) AS sample_rate,
  round(least(1.0, (CAST(total_tokens AS DOUBLE) / n_sources)
                   / CAST(src_tokens AS DOUBLE)) * src_tokens, 2)
    AS expected_tokens
FROM per_src, anchor
"""


@register("domain_mixture_weights", _MIXTURE_ORACLE)
def q_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling rates that rebalance the corpus to a
    token-uniform domain mix (the mixture-weights step of corpus
    assembly). Downsample-only: rate = min(1, target/actual).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text"))).cast("bigint")).alias("src_tokens"),
    )
    anchor = per_src.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("total_tokens").cast("double") / F.col("n_sources"))
        / F.col("src_tokens").cast("double"),
    )
    return per_src.crossJoin(F.broadcast(anchor)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("src_tokens"), 2).alias("expected_tokens"),
    )


# ---------------------------------------------------------------------------
# Train/test contamination (8-gram overlap across the hash split)
# ---------------------------------------------------------------------------

# The split reuses train_val_test_split's exact bucketing (hash60 % 100:
# <80 train, >=90 test) so this measures contamination of the REAL
# holdout. Grams join on their 60-bit hash, not the string — the
# shuffle carries 8-byte keys. Both counting aggs (contaminated docs,
# shared gram vocabulary) are one row each, combined by crossJoin.
_CONTAMINATION_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         {_HASH60.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
         {_duck_shingles(8)} AS shs
  FROM documents
), ex AS (
  SELECT doc_id, bucket,
         {_HASH60.format(x="unnest(shs)")} AS gh
  FROM sh
), train_g AS (
  SELECT DISTINCT gh FROM ex WHERE bucket < 80
), test_pairs AS (
  SELECT DISTINCT doc_id, gh FROM ex WHERE bucket >= 90
), test_docs AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_test_docs FROM test_pairs
), contaminated AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS contaminated_docs,
         CAST(count(DISTINCT tp.gh) AS BIGINT) AS shared_grams
  FROM test_pairs tp JOIN train_g tg ON tp.gh = tg.gh
)
SELECT
  n_test_docs, contaminated_docs, shared_grams,
  round(CAST(contaminated_docs AS DOUBLE)
        / CAST(n_test_docs AS DOUBLE), 6) AS contamination_rate
FROM test_docs, contaminated
"""


@register("split_contamination_8gram", _CONTAMINATION_ORACLE)
def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout contamination check: how many test-split documents share at
    least one 8-gram span with the train split (the leakage metric run
    before every evaluation). Gram vocabulary joins on 60-bit hashes;
    dedup happens BEFORE the join so the probe side is distinct pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    if os.environ.get("SVH_CONTAM_CKPT", "1") != "0":
        # r13: (a) buckets 80-89 (the val split) are never consumed —
        # filter them out at DOC level so 10% of the corpus skips the
        # 8-gram explode entirely; (b) the exploded gram relation feeds
        # both the train vocabulary and the test pairs — checkpoint it
        # once instead of shingling the corpus twice (guide §5).
        from shortvideohybridanalyticslakehouse_spark.plans.registry import (
            defer_release as _dr,
        )

        bucket = hash60(F.col("doc_id").cast("string")) % 100
        pruned = docs.withColumn("bucket", bucket).filter(
            (F.col("bucket") < 80) | (F.col("bucket") >= 90)
        )
        ex = pruned.select(
            "doc_id",
            "bucket",
            F.explode(dedupfns.shingles(F.col("text"), 8)).alias("gram"),
        ).select("doc_id", "bucket", hash60(F.col("gram")).alias("gh"))
        ex = _dr(ex.localCheckpoint(eager=True))
    else:
        ex = docs.select(
            "doc_id",
            (hash60(F.col("doc_id").cast("string")) % 100).alias("bucket"),
            F.explode(dedupfns.shingles(F.col("text"), 8)).alias("gram"),
        ).select("doc_id", "bucket", hash60(F.col("gram")).alias("gh"))
    train_g = ex.filter(F.col("bucket") < 80).select("gh").distinct()
    test_pairs = ex.filter(F.col("bucket") >= 90).select("doc_id", "gh").distinct()
    n_test = test_pairs.agg(
        F.countDistinct("doc_id").alias("n_test_docs")
    )
    hit = test_pairs.join(train_g, "gh")
    contaminated = hit.agg(
        F.countDistinct("doc_id").alias("contaminated_docs"),
        F.countDistinct("gh").alias("shared_grams"),
    )
    return n_test.crossJoin(contaminated).select(
        "n_test_docs",
        "contaminated_docs",
        "shared_grams",
        F.round(
            F.col("contaminated_docs").cast("double")
            / F.col("n_test_docs").cast("double"),
            6,
        ).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# Duplicate-span mining (most-repeated 8-grams across the corpus)
# ---------------------------------------------------------------------------

# Spans are distinct-per-doc, so n_docs is document frequency; the
# groupBy partially aggregates map-side and TakeOrderedAndProject keeps
# a 20-row heap per partition. Tie-break (n_docs DESC, gram ASC) pins
# the LIMIT edge — at this vocabulary most spans tie at low counts.
_DUP_SPANS_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_duck_shingles(8)} AS shs FROM documents
), ex AS (
  SELECT doc_id, unnest(shs) AS gram FROM sh
)
SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
FROM ex GROUP BY gram
ORDER BY n_docs DESC, gram ASC
LIMIT 20
"""


@register("duplicate_ngram_spans", _DUP_SPANS_ORACLE)
def q_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span mining: the 20 most document-frequent 8-gram spans —
    the boilerplate/template detector that precedes span-level dedup
    (repeated spans are removal candidates; MinHash only catches
    whole-doc similarity).
    """
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(dedupfns.shingles(F.col("text"), 8)).alias("gram")
    )
    return (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("gram").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Concat-and-chunk packing audit
# ---------------------------------------------------------------------------

_CHUNK = 2048

# Deterministic shuffle order (hash60 of doc_id, doc_id tie-break), then
# a prefix-sum of token counts decides each doc's chunk span. Round-3
# rework: the prefix sum now comes from operators/ranks.py's bucketed
# two-phase form (offsets of whole earlier buckets + per-bucket running
# sum) — no single-partition window; token counts are integral, so the
# reassociated sum is bit-identical to the oracle's global window.
_PACKING_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         {_HASH60.format(x="CAST(doc_id AS VARCHAR)")} AS h,
         CAST(len({_TOKS}) AS BIGINT) AS tokens
  FROM documents
), c AS (
  SELECT tokens,
         coalesce(sum(tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM t
)
SELECT
  CAST(count(*) AS BIGINT) AS total_docs,
  CAST(sum(tokens) AS BIGINT) AS total_tokens,
  CAST((sum(tokens) + {_CHUNK - 1}) // {_CHUNK} AS BIGINT) AS n_chunks,
  round(CAST(CASE WHEN sum(tokens) % {_CHUNK} = 0 THEN {_CHUNK}
                  ELSE sum(tokens) % {_CHUNK} END AS DOUBLE)
        / {_CHUNK}, 6) AS last_chunk_fill,
  CAST(sum(CASE WHEN cum_before // {_CHUNK}
                  <> (cum_before + tokens - 1) // {_CHUNK}
            THEN 1 ELSE 0 END) AS BIGINT) AS straddling_docs
FROM c
"""


@register("concat_chunk_packing_plan", _PACKING_ORACLE)
def q_concat_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing audit for sequence length 2048: total
    chunks the shuffled corpus fills, tail waste, and how many documents
    straddle a chunk boundary (the attention-bleed metric of naive
    packing — the number document-masked packing would fix).
    """
    from shortvideohybridanalyticslakehouse_spark.operators import ranks

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        hash60(F.col("doc_id").cast("string")).alias("h"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("tokens"),
    )
    c = ranks.with_distributed_prefix_sum(
        t, part_cols=[], order_cols=["h", "doc_id"], value_col="tokens",
        out_col="cum_before", single_pass=True,
    ).select("tokens", "cum_before")
    chunk = F.lit(_CHUNK)
    return c.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("tokens").alias("total_tokens"),
        ((F.sum("tokens") + (_CHUNK - 1)) / chunk).cast("bigint").alias("n_chunks"),
        F.round(
            F.when(F.sum("tokens") % chunk == 0, F.lit(_CHUNK))
            .otherwise(F.sum("tokens") % chunk)
            .cast("double")
            / chunk,
            6,
        ).alias("last_chunk_fill"),
        F.sum(
            F.when(
                F.expr(f"cum_before DIV {_CHUNK}")
                != F.expr(f"(cum_before + tokens - 1) DIV {_CHUNK}"),
                1,
            ).otherwise(0)
        ).alias("straddling_docs"),
    )


# ---------------------------------------------------------------------------
# Corpus novelty (saturation) curve
# ---------------------------------------------------------------------------

# Batches of 100 docs in arrival (doc_id) order; a gram is novel in the
# batch where it FIRST appears. Both aggs group on the gram hash (one
# shuffle each) and the final join is O(batches) rows — the curve's
# size is independent of corpus size.
_NOVELTY_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_duck_shingles(8)} AS shs FROM documents
), pairs AS (
  SELECT DISTINCT doc_id // 100 AS batch,
         {_HASH60.format(x="unnest(shs)")} AS gh
  FROM sh
), totals AS (
  SELECT batch, CAST(count(*) AS BIGINT) AS total_grams
  FROM pairs GROUP BY batch
), first_seen AS (
  SELECT gh, min(batch) AS fb FROM pairs GROUP BY gh
), novel AS (
  SELECT fb AS batch, CAST(count(*) AS BIGINT) AS novel_grams
  FROM first_seen GROUP BY fb
)
SELECT
  CAST(t.batch AS BIGINT) AS batch,
  t.total_grams,
  coalesce(n.novel_grams, 0) AS novel_grams,
  round(CAST(coalesce(n.novel_grams, 0) AS DOUBLE)
        / CAST(t.total_grams AS DOUBLE), 6) AS novelty_rate
FROM totals t LEFT JOIN novel n ON t.batch = n.batch
"""


@register("corpus_novelty_curve", _NOVELTY_ORACLE)
def q_corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation diagnostic: per 100-doc ingest batch, the share
    of its distinct 8-gram vocabulary never seen in earlier batches. A
    falling curve says more of the same data buys less — the
    stop-collecting signal of corpus curation.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select(
            F.expr("doc_id DIV 100").alias("batch"),
            F.explode(dedupfns.shingles(F.col("text"), 8)).alias("gram"),
        )
        .select("batch", hash60(F.col("gram")).alias("gh"))
        .distinct()
    )
    totals = pairs.groupBy("batch").agg(F.count(F.lit(1)).alias("total_grams"))
    novel = (
        pairs.groupBy("gh")
        .agg(F.min("batch").alias("fb"))
        .groupBy(F.col("fb").alias("batch"))
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    return (
        totals.join(novel, "batch", "left")
        .select(
            F.col("batch").cast("bigint").alias("batch"),
            "total_grams",
            F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
            F.round(
                F.coalesce(F.col("novel_grams"), F.lit(0)).cast("double")
                / F.col("total_grams").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
    )
