"""Extension queries, round 47: the INGEST curation funnel — the batch
twin of streaming/funnel.py's incremental screening, registered so the
stream's exact plan (same code path, batch frame) sits under the DuckDB
oracle gate.

Scenario split over the documents table (all closed-form, so the oracle
can replay it): docs with doc_id % 7 == 0 are the EXISTING CORPUS (the
near-dup index side), docs with hash60(doc_id) % 10 == 9 are the
evaluation HOLDOUT (the decontamination side), and everything not in the
corpus is the INCOMING feed. A verdict row survives iff the document
passes language + quality, wins its exact-duplicate group (min doc_id),
agrees with NO corpus signature on >= 8/16 minhashes, and shares NO
8-gram with the holdout.

The oracle replays every stage in SQL — including the minhash family and
the banded corpus join — reusing the same DuckDB fragments the standalone
dedup oracles are verified with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import (
    _DUCK_BASES,
    _duck_shingles,
)
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext9 import (
    QF_MAX_TOP_FRACTION,
    QF_MEAN_WORD_LEN_HI,
    QF_MEAN_WORD_LEN_LO,
    QF_MIN_TOKENS,
    QF_MIN_TTR,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table
from shortvideohybridanalyticslakehouse_spark.streaming import funnel

_SIG_SQL = """
  SELECT doc_id,
    list_transform(range(0, 16),
      i -> list_min(list_transform(hs,
        h -> ((7919 * i + 1) * h + 104729 * i) % 1000000007))) AS sig
"""

_INGEST_ORACLE = rf"""
WITH inc AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tok
  FROM documents WHERE doc_id % 7 <> 0
), s1 AS (
  SELECT * FROM inc WHERE lang = 'en'
), qtok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM s1
), qper AS (
  SELECT doc_id, token, count(*) AS cnt FROM qtok GROUP BY 1, 2
), qdoc AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS q_n,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS top_cnt,
         CAST(sum(cnt * len(token)) AS BIGINT) AS sum_len
  FROM qper GROUP BY 1
), s2 AS (
  SELECT s1.* FROM s1 JOIN qdoc q ON q.doc_id = s1.doc_id
  WHERE q.q_n >= {QF_MIN_TOKENS}
    AND CAST(q.sum_len AS DOUBLE) / q.q_n >= {QF_MEAN_WORD_LEN_LO}
    AND CAST(q.sum_len AS DOUBLE) / q.q_n <= {QF_MEAN_WORD_LEN_HI}
    AND CAST(q.n_distinct AS DOUBLE) / q.q_n >= {QF_MIN_TTR}
    AND CAST(q.top_cnt AS DOUBLE) / q.q_n <= {QF_MAX_TOP_FRACTION}
), s3 AS (
  SELECT doc_id, text, n_tok FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM s2) WHERE rn = 1
), ish AS (
  SELECT doc_id, {_duck_shingles(2)} AS shs FROM s3
), ibases AS (
  SELECT doc_id, {_DUCK_BASES.format(shs='shs')} AS hs FROM ish
), isig AS (
  {_SIG_SQL} FROM ibases
), csh AS (
  SELECT doc_id, {_duck_shingles(2)} AS shs
  FROM documents WHERE doc_id % 7 = 0
), cbases AS (
  SELECT doc_id, {_DUCK_BASES.format(shs='shs')} AS hs FROM csh
), csig AS (
  {_SIG_SQL} FROM cbases
), iband AS (
  SELECT doc_id, sig, b AS band_id,
         md5(CAST(sig[2*b + 1] AS VARCHAR) || '|'
             || CAST(sig[2*b + 2] AS VARCHAR)) AS band_hash
  FROM isig, range(0, 8) AS t(b)
), cband AS (
  SELECT doc_id, sig, b AS band_id,
         md5(CAST(sig[2*b + 1] AS VARCHAR) || '|'
             || CAST(sig[2*b + 2] AS VARCHAR)) AS band_hash
  FROM csig, range(0, 8) AS t(b)
), matches AS (
  SELECT i.doc_id,
         max(len(list_filter(range(1, 17),
             x -> i.sig[x] = c.sig[x]))) AS agree
  FROM iband i JOIN cband c
    ON i.band_id = c.band_id AND i.band_hash = c.band_hash
  GROUP BY 1
), hold_g AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(unnest({_duck_shingles(8)})), 1, 15)) AS BIGINT)
      AS gh
  FROM documents
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % 10 = 9
), cand_g AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(unnest({_duck_shingles(8)})), 1, 15)) AS BIGINT)
      AS gh
  FROM s3
), contaminated AS (
  SELECT DISTINCT c.doc_id FROM cand_g c JOIN hold_g h ON c.gh = h.gh
)
SELECT s3.doc_id, md5(s3.text) AS fp, s3.n_tok,
       round(CAST(coalesce(m.agree, 0) AS DOUBLE) / 16.0, 6)
         AS corpus_agreement
FROM s3 LEFT JOIN matches m ON m.doc_id = s3.doc_id
WHERE coalesce(m.agree, 0) < 8
  AND s3.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


@register("ingest_curation_funnel", _INGEST_ORACLE)
def q_ingest_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run streaming/funnel.py's EXACT plan (same function, batch frame)
    over the closed-form corpus/holdout/incoming split. Every stage the
    stream executes per micro-batch — in-row quality HOFs, the unified
    band+gram probe explode, the stream-static-shaped left join, the
    verdict aggregation — is hash-checked here against a full SQL replay.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    corpus = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    holdout = docs.filter(
        hash60(F.col("doc_id").cast("string")) % 10 == 9
    ).select("doc_id", "text")
    probe_table = funnel.build_curation_probe_table(corpus, holdout)
    incoming = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")),
    )
    return funnel.ingest_curation_plan(incoming, probe_table)
