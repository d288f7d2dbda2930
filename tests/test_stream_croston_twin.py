"""Streaming Croston twin == batch intermittent-demand forecaster, bit
for bit, on the same closed gap-filled weekly series: zero weeks fold
through state, replays are dropped AND counted, and the final
(z, p, forecast) doubles equal the batch query's exactly (identical
IEEE update chain)."""

from __future__ import annotations

import datetime as dt
import os
import time

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    croston_incremental,
)

# Monday — date_trunc('week') boundary, so demand weeks are exact
T0 = dt.datetime(2026, 1, 5, 0, 0, 0)
DEMANDS = {
    1: [5, 0, 0, 9, 0, 3, 0, 0],
    2: [0, 2, 0, 0, 4, 0, 0, 7],
}


def _write_fixture(spark, tmp_path) -> None:
    orders, lineitem = [], []
    okey = 0
    for part, weekly in DEMANDS.items():
        for w, qty in enumerate(weekly):
            if qty == 0:
                continue
            okey += 1
            orders.append((okey, T0 + dt.timedelta(weeks=w)))
            lineitem.append((okey, part, float(qty)))
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_stream_croston_equals_batch(spark, tmp_path):
    _write_fixture(spark, tmp_path)
    reg = load_all()
    batch = {
        r.part: r
        for r in reg["croston_intermittent_forecast"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(batch) == {1, 2}
    assert batch[1].n_weeks == 8 and batch[1].n_demand_weeks == 3

    # stream the SAME gap-filled (part, wk_epoch, d) grid the batch
    # query builds, as 3 arrival files (mtime-pinned), plus one REPLAYED
    # week with bogus demand — must be dropped and counted
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    rows = [
        (part, epoch0 + 7 * w, float(d))
        for part, weekly in DEMANDS.items()
        for w, d in enumerate(weekly)
    ]
    rows.sort(key=lambda r: (r[1], r[0]))
    chunks = [rows[:6], rows[6:12], rows[12:]]
    chunks[2].append((1, epoch0, 999.0))  # replay of part 1's week 0
    t_base = time.time() - 600
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for part, wk, d in ch:
                f.write(f"{part},{wk},{d}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("part long, wk_epoch long, d double")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        croston_incremental(stream)
        .writeStream.format("memory")
        .queryName("croston_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hist = spark.sql("SELECT * FROM croston_twin").collect()
    final = {}
    for r in hist:
        if r.part not in final or r.n_weeks > final[r.part].n_weeks:
            final[r.part] = r

    for part in DEMANDS:
        b, s = batch[part], final[part]
        assert s.n_weeks == b.n_weeks
        assert s.n_demand_weeks == b.n_demand_weeks
        # bit-for-bit: identical IEEE chain on the same closed series
        assert s.z_size == b.z_size
        assert s.p_interval == b.p_interval
        assert s.forecast_per_week == b.forecast_per_week
    # the replayed week was dropped and is OBSERVABLE
    assert final[1].n_weeks_dropped == 1
    assert final[2].n_weeks_dropped == 0
