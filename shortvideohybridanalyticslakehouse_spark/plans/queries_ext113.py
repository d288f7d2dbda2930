"""Extension queries, round 113: MULTI-BLOCK IMA ADPCM — the ext100
stateful-codec oracle extended across block boundaries.

The Spark side decodes real multi-block containers (standard 505-sample
/ 256-byte blocks, fact chunk, functions/multimodal.py round 8). The
DuckDB oracle replays the whole encode+decode state machine per doc as
a list_reduce fold, now with the BLOCK-BOUNDARY semantics in the fold
element: each element carries (sample, is_block_start); at a boundary
the predictor re-seeds from the sample (stored exactly in the block
header — reconstruction error 0 there) while the adapted step index
carries across. A codec that wrongly reset the index, or failed to
re-seed the predictor, desynchronizes every later nibble and fails the
hash — the cross-block contract is what this query pins.
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

_SPB = 505


def _fold_cte_multiblock() -> str:
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
    stepped = f"greatest(-32768, least(32767, acc[1] + {sign} * {diffq}))"
    # block start: predictor re-seeds from the sample (header stores it
    # exactly); otherwise one quantizer step against the carried state
    newpred = (
        f"(CASE WHEN e[2] = 1 THEN greatest(-32768, least(32767, e[1]))"
        f" ELSE {stepped} END)"
    )
    code = f"({d4} * 4 + {d2} * 2 + {d1})"
    newidx = (
        f"(CASE WHEN e[2] = 1 THEN acc[2]"
        f" ELSE greatest(0, least(88, acc[2] + it[{code} + 1])) END)"
    )
    err = f"abs({newpred} - e[1])"
    steps = "[" + ", ".join(str(v) for v in IMA_STEP_TABLE) + "]"
    idxt = "[" + ", ".join(str(v) for v in IMA_INDEX_TABLE) + "]"
    return f"""
WITH tabs AS (
  SELECT {steps} AS st, {idxt} AS it
), doc_n AS (
  SELECT doc_id, CAST(900 + doc_id % 300 AS BIGINT) AS n FROM documents
), samp AS (
  SELECT doc_id, n,
         list_transform(range(0, CAST(n AS INT)),
           i -> [CAST((doc_id * 53 + i * 29) % 8001 - 4000 AS BIGINT),
                 CAST(CASE WHEN i % {_SPB} = 0 THEN 1 ELSE 0 END
                      AS BIGINT)]) AS s
  FROM doc_n
), folded AS (
  SELECT doc_id, n,
    list_reduce(
      list_concat(
        [[s[1][1], CAST(0 AS BIGINT), 0, 0, abs(s[1][1]), abs(s[1][1])]],
        list_slice(s, 2, len(s))
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
         CAST(1 + (n - 1) // {_SPB} AS BIGINT) AS n_blocks,
         f[6] AS peak_abs,
         f[5] AS sum_abs,
         f[3] AS total_abs_err,
         f[4] AS max_abs_err
  FROM folded
)
"""


_MB_DECODE_ORACLE = _fold_cte_multiblock() + "SELECT * FROM stats"


@register("multimodal_adpcm_multiblock_decode", _MB_DECODE_ORACLE)
def q_adpcm_multiblock_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document reconstruction audit of MULTI-BLOCK IMA ADPCM from
    real container bytes (2-3 standard blocks per doc): sample/block
    counts, peak/sum amplitude, total/max quantization error vs the
    closed-form original — the block-boundary contract (predictor
    re-seed, step-index carry) pinned against the DuckDB fold replay."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_adpcm_multiblock_payloads(docs, "doc_id")
    dec = multimodal.adpcm_decoded_samples(payloads, "doc_id")
    j = dec.withColumn(
        "smp", F.expr("CAST((doc_id * 53 + i * 29) % 8001 - 4000 AS BIGINT)")
    )
    err = F.abs(F.col("dec") - F.col("smp"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.expr(
            f"CAST(1 + (count(1) - 1) DIV {_SPB} AS BIGINT)"
        ).alias("n_blocks"),
        F.max(F.abs(F.col("dec"))).cast("bigint").alias("peak_abs"),
        F.sum(F.abs(F.col("dec"))).cast("bigint").alias("sum_abs"),
        F.sum(err).cast("bigint").alias("total_abs_err"),
        F.max(err).cast("bigint").alias("max_abs_err"),
    )
