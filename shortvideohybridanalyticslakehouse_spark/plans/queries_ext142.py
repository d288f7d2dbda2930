"""Extension queries, round 142: span-dedup accounting lanes on top of
the ext141 ExactSubstr base — the numbers a curation pipeline actually
acts on.

1. exact_substring_removal — per-source accounting of what Lee et al.
   ExactSubstr removal would excise: duplicated TOKENS (the union of
   all covered 8-token windows, exact interval-union arithmetic — NOT
   the sum of window lengths, which double-counts overlaps), over total
   tokens, as micro share.
2. span_provenance_matrix — for each unordered source pair, how many
   distinct 8-grams are shared across DIFFERENT documents of the two
   sources (boilerplate flow between feeds; the span-level complement
   of ext137's exact-dup provenance matrix).
3. doc_self_repetition — per-source internal redundancy: mean
   distinct/total 8-gram ratio (micro) and the count of docs below the
   0.5 threshold (template/boilerplate smell, the within-doc complement
   of the cross-doc lanes).

All-integer / micro-floored; every lane shares the single-space
tokenization contract of ext133/ext140/ext141.

Plan shapes at 100 TB: removal is the contamination-class distinct-
shingle equi-join (merge-pinned volume build) + two per-doc
gaps-and-islands window passes over COVERED positions only (output of
the join, tiny relative to the corpus); provenance aggregates a
bounded source alphabet per gram (collect_set over O(sources)); self-
repetition is one shingle-grain aggregation, no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_L = 8

_SH_CTE = f"""
WITH toks AS (
  SELECT doc_id, source,
         string_split(trim(lower(coalesce(text, ''))), ' ') AS ts
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), sh AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(list_slice(ts, i, i + {_L - 1}), ' ') AS g
  FROM (
    SELECT doc_id, source, ts,
           unnest(generate_series(1, len(ts) - {_L - 1})) AS i
    FROM toks WHERE len(ts) >= {_L}
  )
)
"""


def _spark_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.filter(F.length(text) > 0).select(
        "doc_id", "source", F.split(text, " ", -1).alias("ts")
    ).filter(F.size("ts") >= _L)
    return toks.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (_L - 1)),
                lambda i: F.array_join(F.slice(F.col("ts"), i, _L), " "),
            )
        ).alias("pos0", "g"),
    ).select(
        "doc_id", "source", (F.col("pos0") + 1).alias("pos"), "g"
    )


_REMOVAL_ORACLE = (
    _SH_CTE
    + f"""
, tot AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(sum(len(ts)) AS BIGINT) AS total_tokens
  FROM toks GROUP BY 1
), multi AS (
  SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT s.doc_id, s.source, s.pos FROM sh s JOIN multi m USING (g)
), isl AS (
  SELECT doc_id, source, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM cov
), runs AS (
  SELECT doc_id, source, min(pos) AS s_pos,
         max(pos) + {_L - 1} AS e_pos
  FROM isl GROUP BY doc_id, source, grp
), merged AS (
  -- token-interval union: a run's window [s_pos, e_pos] can overlap
  -- the next run's when the position gap is < L; classic running-max
  -- interval merge
  SELECT doc_id, source, s_pos, e_pos,
         CASE WHEN s_pos > coalesce(max(e_pos) OVER (
           PARTITION BY doc_id ORDER BY s_pos, e_pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), -1) THEN 1 ELSE 0 END AS new_iv
  FROM runs
), ivs AS (
  SELECT doc_id, source, s_pos, e_pos,
         sum(new_iv) OVER (
           PARTITION BY doc_id ORDER BY s_pos, e_pos
           ROWS UNBOUNDED PRECEDING) AS iv
  FROM merged
), union_len AS (
  SELECT source, doc_id,
         CAST(sum(iv_len) AS BIGINT) AS dup_tokens
  FROM (
    SELECT source, doc_id, iv,
           max(e_pos) - min(s_pos) + 1 AS iv_len
    FROM ivs GROUP BY source, doc_id, iv
  ) GROUP BY 1, 2
), per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs_with_dups,
         CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens
  FROM union_len GROUP BY 1
)
SELECT t.source, t.n_docs, t.total_tokens,
       CAST(coalesce(p.n_docs_with_dups, 0) AS BIGINT) AS n_docs_with_dups,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(CAST(coalesce(p.dup_tokens, 0) AS HUGEINT) * 1000000
            // t.total_tokens AS BIGINT) AS dup_token_micro
FROM tot t LEFT JOIN per_src p ON p.source = t.source
"""
)


@register("exact_substring_removal", _REMOVAL_ORACLE)
def q_exact_substring_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source ExactSubstr removal accounting: duplicated tokens
    (exact interval union of covered 8-token windows) over total."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.filter(F.length(text) > 0).select(
        "doc_id", "source", F.split(text, " ", -1).alias("ts")
    ).filter(F.size("ts") >= _L)
    tot = toks.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum(F.size("ts")).cast("bigint").alias("total_tokens"),
    )
    sh = _spark_shingles(spark, sf_dir)
    # distinct-gram multi-doc index: the contamination volume-build
    # class -> merge pin (tools/SKEW_PROBE_SHJ.json doctrine)
    multi = (
        sh.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    cov = (
        sh.join(multi.hint("merge"), "g", "left_semi")
        .select("doc_id", "source", "pos")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        cov.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "source", "grp")
        .agg(
            F.min("pos").alias("s_pos"),
            (F.max("pos") + (_L - 1)).alias("e_pos"),
        )
    )
    wiv = Window.partitionBy("doc_id").orderBy("s_pos", "e_pos")
    ivs = (
        runs.withColumn(
            "prev_max",
            F.max("e_pos").over(
                wiv.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "new_iv",
            F.when(
                F.col("s_pos") > F.coalesce(F.col("prev_max"), F.lit(-1)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "iv",
            F.sum("new_iv").over(
                wiv.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    union_len = (
        ivs.groupBy("source", "doc_id", "iv")
        .agg((F.max("e_pos") - F.min("s_pos") + 1).alias("iv_len"))
        .groupBy("source", "doc_id")
        .agg(F.sum("iv_len").cast("bigint").alias("dup_tokens"))
    )
    per_src = union_len.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_with_dups"),
        F.sum("dup_tokens").cast("bigint").alias("dup_tokens"),
    )
    return (
        tot.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.coalesce(F.col("n_docs_with_dups"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_with_dups"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.expr(
                "CAST(CAST(coalesce(dup_tokens, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV total_tokens AS BIGINT)"
            ).alias("dup_token_micro"),
        )
    )


_PROV_ORACLE = (
    _SH_CTE
    + """
, persrc AS (
  SELECT g, source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_in_src
  FROM sh GROUP BY 1, 2
), gsrc AS (
  SELECT g, list_sort(list(source)) AS srcs FROM persrc GROUP BY 1
), pairs AS (
  -- cross cell (a < b): gram held by a doc of a AND a doc of b
  SELECT g, a.s AS source_a, b.s AS source_b
  FROM gsrc, unnest(srcs) AS a(s), unnest(srcs) AS b(s)
  WHERE a.s < b.s
  UNION ALL
  -- diagonal: gram held by >=2 DIFFERENT docs of the same source
  SELECT g, source, source FROM persrc WHERE n_docs_in_src >= 2
)
SELECT source_a, source_b,
       CAST(count(DISTINCT g) AS BIGINT) AS shared_grams
FROM pairs GROUP BY 1, 2
"""
)


@register("span_provenance_matrix", _PROV_ORACLE)
def q_span_provenance_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct 8-grams shared across DIFFERENT docs, per unordered
    source pair (diagonal = within-source multi-doc sharing) — the
    span-level boilerplate-flow matrix."""
    sh = _spark_shingles(spark, sf_dir)
    per_src = sh.groupBy("g", "source").agg(
        F.countDistinct("doc_id").alias("n_docs_in_src")
    )
    gsrc = per_src.groupBy("g").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    # bounded source alphabet: the pair explosion is O(|sources|^2) per
    # gram, never O(docs)
    cross = gsrc.select(
        "g",
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "srcs",
                        lambda a: F.transform(
                            F.col("srcs"),
                            lambda b: F.struct(
                                a.alias("source_a"), b.alias("source_b")
                            ),
                        ),
                    )
                ),
                lambda p: p.source_a < p.source_b,
            )
        ).alias("p"),
    ).select("g", "p.source_a", "p.source_b")
    diag = per_src.filter(F.col("n_docs_in_src") >= 2).select(
        "g",
        F.col("source").alias("source_a"),
        F.col("source").alias("source_b"),
    )
    return (
        cross.unionByName(diag)
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("g").cast("bigint").alias("shared_grams"))
    )


_SELFREP_ORACLE = (
    _SH_CTE
    + """
, per_doc AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
  FROM sh GROUP BY 1, 2
), scored AS (
  SELECT doc_id, source,
         CAST(CAST(n_distinct AS HUGEINT) * 1000000 // n_grams AS BIGINT)
           AS ttr_micro
  FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ttr_micro) // count(*) AS BIGINT) AS mean_ttr_micro,
       CAST(sum(CASE WHEN ttr_micro < 500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_templated
FROM scored GROUP BY 1
"""
)


@register("doc_self_repetition", _SELFREP_ORACLE)
def q_doc_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc 8-gram repetition per source: mean distinct/total
    micro ratio and the count of docs below 0.5 (template smell)."""
    sh = _spark_shingles(spark, sf_dir)
    per_doc = sh.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.countDistinct("g").cast("bigint").alias("n_distinct"),
    )
    scored = per_doc.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(CAST(n_distinct AS DECIMAL(38,0)) * 1000000"
            " DIV n_grams AS BIGINT)"
        ).alias("ttr_micro"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            "CAST(sum(ttr_micro) DIV count(1) AS BIGINT)"
        ).alias("mean_ttr_micro"),
        F.sum(F.when(F.col("ttr_micro") < 500_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_templated"),
    )
