"""Extension queries, round 41: duplication provenance — which sources
duplicate which (cross-source near-dup matrix) and what exactly is being
duplicated (top boilerplate chunks) — the two reports a curation team
reads after the funnel says near-dups exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import (
    _DUCK_BASES,
    _duck_shingles,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_XSOURCE_ORACLE = rf"""
WITH sh AS (
  SELECT doc_id, {_duck_shingles(2)} AS shs FROM documents
), bases AS (
  SELECT doc_id, {_DUCK_BASES.format(shs='shs')} AS hs FROM sh
), sig AS (
  SELECT doc_id,
    list_transform(range(0, 16),
      i -> list_min(list_transform(hs,
        h -> ((7919 * i + 1) * h + 104729 * i) % 1000000007))) AS sig
  FROM bases
), banded AS (
  SELECT doc_id, sig, b AS band_id,
         md5(CAST(sig[2*b + 1] AS VARCHAR) || '|'
             || CAST(sig[2*b + 2] AS VARCHAR)) AS band_hash
  FROM sig, range(0, 8) AS t(b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  WHERE len(list_filter(range(1, 17),
        i -> a.sig[i] = b.sig[i])) >= 8
), src AS (
  SELECT doc_id, source FROM documents
)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE sa.source <> sb.source) AS BIGINT)
         AS cross_source_pairs
FROM pairs p
JOIN src sa ON sa.doc_id = p.doc_a
JOIN src sb ON sb.doc_id = p.doc_b
GROUP BY 1, 2
ORDER BY n_pairs DESC, source_a ASC, source_b ASC
LIMIT 30
"""


@register("cross_source_dup_matrix", _XSOURCE_ORACLE)
def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup provenance matrix: MinHash candidate pairs (agreement
    >= 8/16) attributed to their (source, source) cell, unordered cell
    key via least/greatest. Within-source mass = internal boilerplate;
    off-diagonal mass = one source syndicating another — the decision
    input for per-source dedup policy. The source dim joins broadcast
    onto the O(pairs) relation; the banding join is the standard
    docs x bands shuffle.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    with_sig = dedupfns.minhash_signatures_df(
        docs, "doc_id", "text", k=2, num_hashes=16, out_col="minhash"
    )
    pairs = (
        dedupfns.minhash_candidate_pairs(
            with_sig, id_col="doc_id", sig_col="minhash", num_hashes=16, band_size=2
        )
        .filter(F.col("est_jaccard") * 16 >= 8)
        .select("doc_a", "doc_b")
    )
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .groupBy(
            F.least(F.col("sa"), F.col("sb")).alias("source_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_if(F.col("sa") != F.col("sb")).alias("cross_source_pairs"),
        )
        .orderBy(
            F.col("n_pairs").desc(), F.col("source_a").asc(), F.col("source_b").asc()
        )
        .limit(30)
    )


_TOP_CHUNKS_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), chunks AS (
  SELECT doc_id,
         md5(array_to_string(
           list_slice(toks, s.start + 1, s.start + least(64, n_tok - s.start)),
           ' ')) AS chunk_hash
  FROM docs, LATERAL (
    SELECT unnest(generate_series(0, CAST(n_tok - 1 AS BIGINT), 48)) AS start
  ) s
)
SELECT chunk_hash,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS example_doc
FROM chunks
GROUP BY 1
HAVING count(*) > 1
ORDER BY n_occurrences DESC, chunk_hash ASC
LIMIT 20
"""


@register("top_boilerplate_chunks", _TOP_CHUNKS_ORACLE)
def q_top_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHAT of chunk-level duplication (chunk_dedup_stats is the HOW
    MUCH): the 20 most-repeated 64/48-stride chunks with occurrence and
    document counts plus a representative doc to inspect. One explode,
    one hash-keyed aggregate, TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).withColumn("n_tok", F.size("toks").cast("bigint"))
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.col("n_tok") - 1, F.lit(48).cast("bigint")
            )
        ).alias("start"),
        "toks",
        "n_tok",
    ).select(
        "doc_id",
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
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), F.col("chunk_hash").asc())
        .limit(20)
    )
