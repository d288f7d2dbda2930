"""Extension queries, round 26: PII scrubbing audit and repetition-based
quality filters — two more training-data-pipeline staples over `documents`.

Both stay entirely JVM-side (regexp + array higher-order functions; no
UDF) and aggregate per `source`, so the shuffle is O(sources) however
large the corpus: the per-doc work is a narrow projection and partial
aggregation folds it before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# PII detection / redaction audit
# ---------------------------------------------------------------------------

# RE2- and Java-regex-compatible patterns (no lookaround): email, URL,
# IPv4, and a digit-run phone shape. Redaction replaces every hit with a
# fixed tag; the audit reports hit counts per class and the total char
# delta — the numbers a privacy review of a crawl snapshot asks for.
_PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}
_PII_ORDER = sorted(_PII_PATTERNS)  # stable application order for redaction


def _pii_oracle() -> str:
    hits = ",\n    ".join(
        f"CAST(len(regexp_extract_all(t, '{_PII_PATTERNS[k]}')) AS BIGINT)"
        f" AS n_{k}"
        for k in _PII_ORDER
    )
    red = "t"
    for k in _PII_ORDER:
        red = f"regexp_replace({red}, '{_PII_PATTERNS[k]}', '<PII>', 'g')"
    return f"""
WITH scored AS (
  SELECT source, coalesce(text, '') AS t FROM documents
), per_doc AS (
  SELECT source,
    {hits},
    CAST(length(t) AS BIGINT) AS n_chars_raw,
    CAST(length({red}) AS BIGINT) AS n_chars_redacted
  FROM scored
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  {", ".join(f"CAST(sum(n_{k}) AS BIGINT) AS n_{k}" for k in _PII_ORDER)},
  CAST(sum(CASE WHEN {" + ".join("n_" + k for k in _PII_ORDER)} > 0
       THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
  CAST(sum(n_chars_raw - n_chars_redacted) AS BIGINT) AS chars_removed
FROM per_doc
GROUP BY source
"""


@register("doc_pii_redaction_stats", _pii_oracle())
def q_doc_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit: per-source counts of email/URL/IPv4/phone hits, docs
    containing any PII, and the char volume redaction would remove.

    Detection is `regexp_count`, redaction `regexp_replace` (global in
    both engines), applied in a fixed class order so overlapping matches
    resolve identically. Narrow projection -> O(sources) aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    red = t
    for k in _PII_ORDER:
        red = F.regexp_replace(red, _PII_PATTERNS[k], "<PII>")
    per_doc = docs.select(
        "source",
        *[
            F.regexp_count(t, F.lit(_PII_PATTERNS[k]))
            .cast("bigint")
            .alias(f"n_{k}")
            for k in _PII_ORDER
        ],
        F.length(t).cast("bigint").alias("n_chars_raw"),
        F.length(red).cast("bigint").alias("n_chars_redacted"),
    )
    any_pii = sum(
        (F.col(f"n_{k}") for k in _PII_ORDER[1:]), F.col(f"n_{_PII_ORDER[0]}")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(f"n_{k}").cast("bigint").alias(f"n_{k}") for k in _PII_ORDER],
        F.sum(F.when(any_pii > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_with_pii"),
        F.sum(F.col("n_chars_raw") - F.col("n_chars_redacted"))
        .cast("bigint")
        .alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filters (Gopher-style)
# ---------------------------------------------------------------------------

# Two repetition signals per doc, both computed in-row with array HOFs
# (no explode, no per-token shuffle):
#   token_rep  = 1 - distinct_tokens / total_tokens
#   bigram_rep = 1 - distinct_bigrams / total_bigrams
# Docs exceeding the thresholds are what a Gopher/C4-style pipeline
# drops before training. Thresholds are literals shared with the oracle.
_REP_TOKEN_MAX = 0.30
_REP_BIGRAM_MAX = 0.20

_REP_ORACLE = f"""
WITH toks AS (
  SELECT source,
    regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS tk
  FROM documents
), m AS (
  SELECT source,
    CAST(len(tk) AS BIGINT) AS n_tok,
    CAST(len(list_distinct(tk)) AS BIGINT) AS n_tok_d,
    CAST(len(list_transform(range(1, greatest(len(tk), 1)),
         i -> tk[i] || ' ' || tk[i+1])) AS BIGINT) AS n_bg,
    CAST(len(list_distinct(list_transform(range(1, greatest(len(tk), 1)),
         i -> tk[i] || ' ' || tk[i+1]))) AS BIGINT) AS n_bg_d
  FROM toks
), r AS (
  SELECT source,
    CASE WHEN n_tok > 0
         THEN 1.0 - n_tok_d / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS tok_rep,
    CASE WHEN n_bg > 0
         THEN 1.0 - n_bg_d / CAST(n_bg AS DOUBLE) ELSE 0.0 END AS bg_rep
  FROM m
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(avg(tok_rep), 6) AS avg_token_rep,
  round(avg(bg_rep), 6) AS avg_bigram_rep,
  CAST(sum(CASE WHEN tok_rep > {_REP_TOKEN_MAX} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flag_token_rep,
  CAST(sum(CASE WHEN bg_rep > {_REP_BIGRAM_MAX} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flag_bigram_rep
FROM r
GROUP BY source
"""


@register("doc_repetition_quality", _REP_ORACLE)
def q_doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screens: per-source mean token/bigram
    repetition and how many docs each threshold would drop.

    Bigram enumeration: DuckDB uses `range(1, greatest(n,1))` (upper
    bound exclusive — empty for 0/1-token docs); Spark zips the two
    length-(n-1) slices (NOT `sequence(1, n-1)`: Spark's sequence with
    start > stop DESCENDS, so a 1-token doc would yield [1,0], not []).
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    n_tok = F.size(tk)
    bigrams = F.expr(
        "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), "
        "slice(tk, 2, greatest(size(tk) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))"
    )
    m = docs.select(
        "source",
        n_tok.cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(tk)).cast("bigint").alias("n_tok_d"),
        tk.alias("tk"),
    ).select(
        "source",
        "n_tok",
        "n_tok_d",
        F.size(bigrams).cast("bigint").alias("n_bg"),
        F.size(F.array_distinct(bigrams)).cast("bigint").alias("n_bg_d"),
    )
    tok_rep = F.when(
        F.col("n_tok") > 0,
        F.lit(1.0) - F.col("n_tok_d") / F.col("n_tok").cast("double"),
    ).otherwise(F.lit(0.0))
    bg_rep = F.when(
        F.col("n_bg") > 0,
        F.lit(1.0) - F.col("n_bg_d") / F.col("n_bg").cast("double"),
    ).otherwise(F.lit(0.0))
    r = m.select("source", tok_rep.alias("tok_rep"), bg_rep.alias("bg_rep"))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("tok_rep"), 6).alias("avg_token_rep"),
        F.round(F.avg("bg_rep"), 6).alias("avg_bigram_rep"),
        F.sum(F.when(F.col("tok_rep") > _REP_TOKEN_MAX, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flag_token_rep"),
        F.sum(F.when(F.col("bg_rep") > _REP_BIGRAM_MAX, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flag_bigram_rep"),
    )
