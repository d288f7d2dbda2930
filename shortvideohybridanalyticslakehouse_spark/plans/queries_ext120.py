"""Extension queries, round 120: DSIR data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") — score
every raw document by the log-likelihood ratio of a TARGET unigram LM
(here: the English slice) against the RAW-corpus LM, the published
recipe for picking pretraining data that "looks like" a target domain.

Per document d with term frequencies tf(d,w):

    dsir(d) = sum over w of tf(d,w) * ln( p_tgt(w) / p_raw(w) )

with add-1 smoothing over the raw corpus vocabulary:
p_tgt(w) = (cnt_tgt(w)+1) / (N_tgt+V), p_raw(w) = (cnt_raw(w)+1) /
(N_raw+V). A positive score marks a document worth up-sampling toward
the target distribution.

Determinism contract (the ext92 bigram-LM discipline): the per-term log
ratio is ONE ln of one double division of exact integers — identical
IEEE doubles on both engines — floored to micro units BEFORE the
per-document sum, so every rollup after that is exact-integer and
order-independent. Token convention is the corpus-wide ext9 rule
(whitespace split of lower(trim(text))).

Plan shape for 100 TB: two vocabulary aggregations (target and raw —
map-side combinable, output O(V)), then one join of per-(doc,term)
counts against the broadcast-able vocab table and one per-doc sum. The
selection summary reduces to O(sources). No windows, no Python; the
top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TARGET_LANG = "en"
_TOPK = 20

_VOCAB_CTE = f"""
WITH tok AS (
  SELECT doc_id, source, lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
), dt AS (
  SELECT doc_id, source, lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3, 4
), vocab AS (
  SELECT term,
         CAST(sum(tf) AS BIGINT) AS cnt_raw,
         CAST(sum(CASE WHEN lang = '{_TARGET_LANG}' THEN tf ELSE 0 END)
              AS BIGINT) AS cnt_tgt
  FROM dt GROUP BY 1
), tots AS (
  SELECT CAST(sum(cnt_raw) AS BIGINT) AS n_raw,
         CAST(sum(cnt_tgt) AS BIGINT) AS n_tgt,
         CAST(count(*) AS BIGINT) AS v
  FROM vocab
), lr AS (
  SELECT term,
         CAST(floor(1000000.0 * ln(
           (CAST(cnt_tgt + 1 AS DOUBLE) * (n_raw + v))
           / (CAST(cnt_raw + 1 AS DOUBLE) * (n_tgt + v))
         )) AS BIGINT) AS lr_micro
  FROM vocab CROSS JOIN tots
), per_doc AS (
  SELECT dt.doc_id, dt.source, dt.lang,
         CAST(sum(dt.tf) AS BIGINT) AS n_tok,
         CAST(sum(dt.tf * lr.lr_micro) AS BIGINT) AS dsir_micro
  FROM dt JOIN lr USING (term)
  GROUP BY 1, 2, 3
)
"""

_DSIR_TOPK_ORACLE = (
    _VOCAB_CTE
    + f"""
SELECT doc_id, source, lang, n_tok, dsir_micro
FROM per_doc
ORDER BY dsir_micro DESC, doc_id ASC
LIMIT {_TOPK}
"""
)

_DSIR_RATES_ORACLE = (
    _VOCAB_CTE
    + """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dsir_micro) // count(*) AS BIGINT) AS mean_dsir_micro,
       CAST(count(*) FILTER (WHERE dsir_micro > 0) AS BIGINT) AS n_selected
FROM per_doc GROUP BY 1
"""
)


def doc_term_freqs(docs: DataFrame) -> DataFrame:
    """Per-(doc, term) frequencies under the corpus-wide ext9 token
    rule; the frame both the batch vocab and the streamed vocab MV
    (tests/test_stream_dsir_mv.py) aggregate."""
    tok = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    return tok.groupBy("doc_id", "source", "lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def vocab_from_dt(dt: DataFrame) -> DataFrame:
    """Target/raw unigram counts per term — a pure counting monoid, so a
    streaming MV maintains it incrementally."""
    return dt.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("cnt_raw"),
        F.sum(
            F.when(F.col("lang") == _TARGET_LANG, F.col("tf")).otherwise(0)
        )
        .cast("bigint")
        .alias("cnt_tgt"),
    )


def dsir_scores(dt: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document DSIR importance from any (dt, vocab) pair — batch
    and streamed-vocab paths share this scoring verbatim."""
    tots = vocab.agg(
        F.sum("cnt_raw").cast("bigint").alias("n_raw"),
        F.sum("cnt_tgt").cast("bigint").alias("n_tgt"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(tots)).select(
        "term",
        F.floor(
            F.lit(1000000.0)
            * F.log(
                ((F.col("cnt_tgt") + 1).cast("double") * (F.col("n_raw") + F.col("v")))
                / (
                    (F.col("cnt_raw") + 1).cast("double")
                    * (F.col("n_tgt") + F.col("v"))
                )
            )
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    return (
        dt.join(lr, "term")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            F.sum(F.col("tf") * F.col("lr_micro"))
            .cast("bigint")
            .alias("dsir_micro"),
        )
    )


def _per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    dt = doc_term_freqs(docs)
    return dsir_scores(dt, vocab_from_dt(dt))


@register("dsir_importance_topk", _DSIR_TOPK_ORACLE)
def q_dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by DSIR importance toward the English target LM
    — the documents importance resampling would up-weight first."""
    return (
        _per_doc(spark, sf_dir)
        .orderBy(F.col("dsir_micro").desc(), F.col("doc_id").asc())
        .limit(_TOPK)
        .select("doc_id", "source", "lang", "n_tok", "dsir_micro")
    )


@register("dsir_source_selection_rates", _DSIR_RATES_ORACLE)
def q_dsir_source_selection_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source DSIR selection profile: document count, mean
    importance (micro, integer DIV), and how many documents score
    positive (would be up-sampled toward the target)."""
    pd_ = _per_doc(spark, sf_dir)
    return pd_.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("CAST(sum(dsir_micro) DIV count(1) AS BIGINT)").alias(
            "mean_dsir_micro"
        ),
        F.count(F.when(F.col("dsir_micro") > 0, 1))
        .cast("bigint")
        .alias("n_selected"),
    )
