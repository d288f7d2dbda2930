"""Extension queries, round 25: language identification (training-data
pipeline surface).

Language-ID via weighted marker-n-gram profiles — the classic
stopword/charset heuristic (the same family as CLD/langid's character
n-gram scoring, computed with built-in regexp counting so the whole
operator stays JVM-side; no UDF). The corpus ships a `lang` ground-truth
column, so the query emits the detector's confusion matrix against it —
exactly what a data-quality audit of a 100 TB multilingual crawl needs.

Scale: one narrow projection (5 `regexp_count` + CASE argmax) followed by a
tiny groupBy on (lang, predicted_lang) — partial aggregation makes the
shuffle a few dozen rows regardless of corpus size.

Reference tie-in: the reference's text surface is contract validation only
(SURVEY.md §2.2); language-ID is part of the extension operator set
(documents table, TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# Marker profiles: high-frequency function words per language (public
# stopword lists), plus a Han-codepoint charset probe for zh. Word-boundary
# alternations behave identically in Java regex (Spark) and RE2 (DuckDB);
# counts are non-overlapping in both engines.
_LANG_MARKERS: dict[str, str] = {
    "de": r"\b(der|die|und|das|ist|nicht|ein|mit)\b",
    "en": r"\b(the|and|of|is|in|that|it|for)\b",
    "es": r"\b(el|la|de|que|los|las|una|por)\b",
    "fr": r"\b(le|les|et|des|une|est|dans|pour)\b",
    # Han unicode block as a literal char range (same codepoints both engines)
    "zh": "[一-鿿]",
}
_ORDERED = sorted(_LANG_MARKERS)  # deterministic argmax tie-break order


def _oracle() -> str:
    score_cols = ",\n    ".join(
        f"CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}')) AS BIGINT)"
        f" AS s_{lang}"
        for lang, pat in _LANG_MARKERS.items()
    )
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in _ORDERED) + ")"
    case = " ".join(f"WHEN s_{lg} = {m} THEN '{lg}'" for lg in _ORDERED)
    return f"""
WITH scored AS (
  SELECT lang,
    {score_cols}
  FROM documents
), pred AS (
  SELECT lang,
    CASE WHEN {m} = 0 THEN 'und' {case} END AS predicted_lang
  FROM scored
)
SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred
GROUP BY lang, predicted_lang
"""


@register("doc_language_id", _oracle())
def q_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-n-gram language detector -> confusion matrix vs ground truth.

    Per doc: count matches of each language's marker profile (JVM-side
    `regexp_count`), predict the argmax with an alphabetical tie-break
    ('und' when no profile fires), then aggregate (actual, predicted)
    pairs. The wide scoring projection is narrow (no shuffle); the final
    groupBy shuffles only the tiny confusion-matrix keyspace.
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    scored = docs.select(
        "lang",
        *[
            F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"s_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    m = F.greatest(*[F.col(f"s_{lg}") for lg in _ORDERED])
    pred = F.when(m == 0, F.lit("und"))
    for lg in _ORDERED:
        pred = pred.when(F.col(f"s_{lg}") == m, F.lit(lg))
    return (
        scored.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
