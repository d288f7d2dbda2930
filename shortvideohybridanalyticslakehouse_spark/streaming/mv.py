"""Generic incremental materialized-view maintenance (round 7): declare
a keyed set of RE-AGGREGABLE measures, and a foreachBatch maintainer
keeps a bucketed parquet MV current with per-batch cost
O(batch + touched buckets) — the framework generalization of the
specific maintainers the engine already ships (gold minute agg, SCD2
bands, sketch merges).

Algebra: every measure must be a commutative-monoid partial — count and
sum merge by SUM, min by MIN, max by MAX (sum-of-squares etc. are just
sums). The merge step is therefore UNION + re-aggregate, the same
decomposition Spark's own partial aggregation uses map-side, and the
same one the batch oracle replays — so stream==batch equality is a
theorem about the monoid, checked by the tests, not a coincidence of
scheduling. Non-decomposable measures (exact quantiles, distinct counts)
belong to the sketch lanes (functions/sketches.py), not here.

Store layout and crash contract are the scd2.py skeleton: micro-batch
partials staged to parquet (consumes every partition, no driver
collect), ``bucket=N/`` dirs on pmod(xxhash64(keys...), n_buckets), only
touched buckets rebuilt, per-bucket ``_applied_batch_*`` markers riding
each bucket's atomic two-rename swap, ``_old_bucket_N`` recovery on
entry. Replay of a committed batch is a per-bucket no-op; a torn swap
restores and re-applies.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_BUCKETS = 16

_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class Measure:
    """One MV column: ``agg`` computes the per-batch partial over raw
    rows; ``merge`` ('sum' | 'min' | 'max') folds partials together."""

    name: str
    agg: Column
    merge: str

    def __post_init__(self):
        if self.merge not in _MERGE_FNS:
            raise ValueError(
                f"measure {self.name!r}: merge must be one of "
                f"{sorted(_MERGE_FNS)}, got {self.merge!r}"
            )


def counting(name: str = "n") -> Measure:
    return Measure(name, F.count(F.lit(1)).cast("bigint"), "sum")


def summing(col: Column, name: str) -> Measure:
    return Measure(name, F.sum(col), "sum")


def minning(col: Column, name: str) -> Measure:
    return Measure(name, F.min(col), "min")


def maxing(col: Column, name: str) -> Measure:
    return Measure(name, F.max(col), "max")


@dataclass(frozen=True)
class MvSpec:
    key_cols: tuple[str, ...]
    measures: tuple[Measure, ...]

    def partials(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.key_cols).agg(
            *[m.agg.alias(m.name) for m in self.measures]
        )

    def remerge(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.key_cols).agg(
            *[
                _MERGE_FNS[m.merge](F.col(m.name)).alias(m.name)
                for m in self.measures
            ]
        )

    def bucket_expr(self, n_buckets: int) -> Column:
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(n_buckets)).cast("int")


def _bucket_dir(store: str, b: int) -> str:
    return os.path.join(store, f"bucket={b}")


def _old_dir(store: str, b: int) -> str:
    return os.path.join(store, f"_old_bucket_{b}")


def recover_store(store: str) -> None:
    """scd2.recover_table contract: restore torn swaps, drop stale
    stage/tmp dirs."""
    if not os.path.isdir(store):
        return
    for name in os.listdir(store):
        full = os.path.join(store, name)
        if name.startswith("_old_bucket_"):
            live = _bucket_dir(store, int(name[len("_old_bucket_") :]))
            if os.path.isdir(live):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.rename(full, live)
        elif name.startswith(("_tmp_", "_stage_")):
            shutil.rmtree(full, ignore_errors=True)


def merge_mv_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store: str,
    batch_id: int,
    spec: MvSpec,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """foreachBatch body: fold one micro-batch into the MV."""
    os.makedirs(store, exist_ok=True)
    recover_store(store)

    stage = os.path.join(store, f"_stage_{batch_id}")
    spec.partials(batch_df).write.mode("overwrite").parquet(stage)
    try:
        if not any(f.endswith(".parquet") for f in os.listdir(stage)):
            return  # empty batch, partitions already consumed
        staged = spark.read.parquet(stage)
        wb = spec.bucket_expr(n_buckets)
        touched = sorted(
            r["b"] for r in staged.select(wb.alias("b")).distinct().collect()
        )
        todo = [
            b
            for b in touched
            if not os.path.exists(
                os.path.join(_bucket_dir(store, b), f"_applied_batch_{batch_id}")
            )
        ]
        if not todo:
            return
        delta = staged.filter(wb.isin(todo))
        have = [b for b in todo if os.path.isdir(_bucket_dir(store, b))]
        if have:
            cur = spark.read.parquet(*[_bucket_dir(store, b) for b in have])
            merged = spec.remerge(cur.unionByName(delta))
        else:
            merged = delta  # partials of one batch are already merged
        tmp_root = os.path.join(store, f"_tmp_{batch_id}")
        shutil.rmtree(tmp_root, ignore_errors=True)
        merged.withColumn("bucket", spec.bucket_expr(n_buckets)).write.partitionBy(
            "bucket"
        ).parquet(tmp_root)
        for b in todo:
            new_dir = os.path.join(tmp_root, f"bucket={b}")
            os.makedirs(new_dir, exist_ok=True)
            live = _bucket_dir(store, b)
            if os.path.isdir(live):
                for f in os.listdir(live):
                    if f.startswith("_applied_batch_"):
                        with open(os.path.join(new_dir, f), "w"):
                            pass
            with open(
                os.path.join(new_dir, f"_applied_batch_{batch_id}"), "w"
            ):
                pass
            old = _old_dir(store, b)
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(live):
                os.rename(live, old)
            os.rename(new_dir, live)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp_root, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def read_mv(spark: SparkSession, store: str, spec: MvSpec) -> DataFrame:
    """Current MV contents (partition-discovery 'bucket' column dropped)."""
    return spark.read.parquet(store).select(
        *spec.key_cols, *[m.name for m in spec.measures]
    )


def start_mv_job(
    spark: SparkSession,
    source: DataFrame,
    store: str,
    checkpoint_dir: str,
    spec: MvSpec,
    trigger: dict | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> StreamingQuery:
    trigger = trigger or {"availableNow": True}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        merge_mv_batch(spark, batch_df, store, batch_id, spec, n_buckets)

    return (
        source.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
