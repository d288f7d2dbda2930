"""Extension queries, round 100: IMA ADPCM — the first STATEFUL codec in
the multimodal pack (WAV/PCM, G.711 mu-law, AVI, PNG, GIF, JPEG are all
stateless per sample/pixel/MCU; ADPCM's 4-bit nibbles are quantized
against a (predictor, step-index) pair the previous nibble mutated).

The Spark side decodes REAL container bytes (functions/multimodal.py:
encode_wav_adpcm / adpcm_decoded_samples, Arrow lane). The DuckDB oracle
replays the ENTIRE encode+decode state machine per document as a
list_reduce fold from the closed-form fixture samples — list
accumulator [pred, idx, sum_abs_err, max_err, sum_abs, peak], step and
index tables carried as columns so the literals appear once. All
arithmetic is integer (step >> k as //, int16 clamp via
greatest/least), so a single wrong mantissa bit in either engine
desynchronizes every later sample and fails the hash — the strongest
cross-engine check in the codec family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.functions.multimodal import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def _fold_cte() -> str:
    step = "st[acc[2] + 1]"
    mag = "abs(e[1] - acc[1])"
    d4 = f"(CASE WHEN {mag} >= {step} THEN 1 ELSE 0 END)"
    m1 = f"({mag} - {d4} * {step})"
    d2 = f"(CASE WHEN {m1} >= {step} // 2 THEN 1 ELSE 0 END)"
    m2 = f"({m1} - {d2} * ({step} // 2))"
    d1 = f"(CASE WHEN {m2} >= {step} // 4 THEN 1 ELSE 0 END)"
    diffq = (
        f"({step} // 8 + {d4} * {step} + {d2} * ({step} // 2)"
        f" + {d1} * ({step} // 4))"
    )
    sign = "(CASE WHEN e[1] < acc[1] THEN -1 ELSE 1 END)"
    newpred = f"greatest(-32768, least(32767, acc[1] + {sign} * {diffq}))"
    code = f"({d4} * 4 + {d2} * 2 + {d1})"
    newidx = f"greatest(0, least(88, acc[2] + it[{code} + 1]))"
    err = f"abs({newpred} - e[1])"
    steps = "[" + ", ".join(str(v) for v in IMA_STEP_TABLE) + "]"
    idxt = "[" + ", ".join(str(v) for v in IMA_INDEX_TABLE) + "]"
    return f"""
WITH tabs AS (
  SELECT {steps} AS st, {idxt} AS it
), doc_n AS (
  SELECT doc_id, CAST(240 + doc_id % 161 AS BIGINT) AS n FROM documents
), samp AS (
  SELECT doc_id, n,
         list_transform(range(0, CAST(n AS INT)),
           i -> CAST((doc_id * 53 + i * 29) % 8001 - 4000 AS BIGINT)) AS s
  FROM doc_n
), folded AS (
  SELECT doc_id, n,
    list_reduce(
      list_concat(
        [[s[1], CAST(0 AS BIGINT), 0, 0, abs(s[1]), abs(s[1])]],
        list_transform(list_slice(s, 2, len(s)), x -> [x])
      ),
      (acc, e) -> [
        {newpred},
        {newidx},
        acc[3] + {err},
        greatest(acc[4], {err}),
        acc[5] + abs({newpred}),
        greatest(acc[6], abs({newpred}))
      ]
    ) AS f
  FROM samp, tabs
), stats AS (
  SELECT doc_id,
         n AS n_samples,
         f[6] AS peak_abs,
         f[5] AS sum_abs,
         f[3] AS total_abs_err,
         f[4] AS max_abs_err
  FROM folded
)
"""


_ADPCM_DECODE_ORACLE = _fold_cte() + "SELECT * FROM stats"

_ADPCM_PROFILE_ORACLE = (
    _fold_cte()
    + """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_samples) AS BIGINT) AS n_samples,
       CAST(sum(total_abs_err) AS BIGINT) AS total_abs_err,
       CAST(max(max_abs_err) AS BIGINT) AS max_abs_err,
       CAST(sum(total_abs_err) * 1000000 // sum(n_samples) AS BIGINT)
         AS mean_err_micro,
       CAST(min(CASE WHEN max_abs_err = m.gmax THEN doc_id END) AS BIGINT)
         AS worst_doc
FROM stats, (SELECT max(max_abs_err) AS gmax FROM stats) m
"""
)


def _decoded_with_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_adpcm_payloads(docs, "doc_id")
    dec = multimodal.adpcm_decoded_samples(payloads, "doc_id")
    return dec.withColumn(
        "smp", F.expr("CAST((doc_id * 53 + i * 29) % 8001 - 4000 AS BIGINT)")
    )


@register("multimodal_adpcm_decode", _ADPCM_DECODE_ORACLE)
def q_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document IMA ADPCM reconstruction audit from REAL codec
    bytes: sample count, peak/sum of reconstructed amplitude, and the
    total/max absolute quantization error vs the closed-form original
    (computed inline from (doc_id, i) — no join, the ext62 lesson)."""
    j = _decoded_with_orig(spark, sf_dir)
    err = F.abs(F.col("dec") - F.col("smp"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.max(F.abs(F.col("dec"))).cast("bigint").alias("peak_abs"),
        F.sum(F.abs(F.col("dec"))).cast("bigint").alias("sum_abs"),
        F.sum(err).cast("bigint").alias("total_abs_err"),
        F.max(err).cast("bigint").alias("max_abs_err"),
    )


@register("multimodal_adpcm_error_profile", _ADPCM_PROFILE_ORACLE)
def q_adpcm_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide ADPCM distortion profile: doc/sample counts, error
    totals, mean error in micro units, and the worst document (smallest
    doc_id among max-error ties)."""
    j = _decoded_with_orig(spark, sf_dir)
    err = F.abs(F.col("dec") - F.col("smp"))
    per_doc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum(err).cast("bigint").alias("total_abs_err"),
        F.max(err).cast("bigint").alias("max_abs_err"),
    )
    gmax = F.broadcast(
        per_doc.agg(F.max("max_abs_err").alias("gmax"))
    )
    return per_doc.crossJoin(gmax).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_samples").cast("bigint").alias("n_samples"),
        F.sum("total_abs_err").cast("bigint").alias("total_abs_err"),
        F.max("max_abs_err").cast("bigint").alias("max_abs_err"),
        # Integer DIV, not float floor-division: sum*1e6 reaches ~1e13 at
        # larger SF where 1/b < ulp of the quotient (ext90/ext103 rule).
        F.expr(
            "CAST((sum(total_abs_err) * 1000000) DIV sum(n_samples) AS BIGINT)"
        ).alias("mean_err_micro"),
        F.min(
            F.when(F.col("max_abs_err") == F.col("gmax"), F.col("doc_id"))
        )
        .cast("bigint")
        .alias("worst_doc"),
    )
