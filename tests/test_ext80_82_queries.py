"""Planted-fixture tests for the round-6 analytics additions: BFS hop
distances (ext80), Holt double-exponential smoothing (ext81), and the
data-contract expectation suite (ext82)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id long, source string, text string")\
        .write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_bfs_planted_chain(spark, tmp_path):
    """Plant a near-dup CHAIN seed(0) ~ 5 ~ 10 by pairwise-overlapping
    texts, plus an isolated pair far from seeds: hop distances must be
    seed=0, 1, 2 and the isolated pair unreached."""
    w = [f"w{i}" for i in range(12)]
    base = " ".join(w)  # empirically: edges (0,5) and (5,10), no (0,10)
    mid = " ".join(w[:10] + ["x10", "x11"])
    far = " ".join(["y0", "y1"] + w[2:10] + ["x10", "x11"])
    other = "one two three four five six seven eight"
    rows = [
        (0, "s", base),      # seed (0 % 97 == 0)
        (5, "s", mid),       # near-dup of base AND of far
        (10, "s", far),      # near-dup of mid only
        (201, "s", other),   # isolated near-dup pair, no seed
        (202, "s", other),
    ]
    _write_docs(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.dist: (r.n_docs, r.doc_id_sum)
        for r in reg["similarity_graph_bfs_hops"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (1, 0)
    assert got[1][0] >= 1 and 5 in range(0, 1000)  # doc 5 at dist 1
    assert got[1] == (1, 5)
    assert got.get(2) == (1, 10)
    # isolated component never appears at any distance
    assert all(s < 200 or d == 0 for d, (n, s) in got.items())


def test_holt_planted_series(spark, tmp_path):
    """Hand-fold a tiny hourly series and compare every output field."""
    t0 = dt.datetime(2026, 4, 1, 0, 0, 0)
    xs = [3, 1, 4, 1, 5]
    rows = []
    eid = 0
    for hour, n in enumerate(xs):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(hours=hour, minutes=1), 1, "click",
                 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    l, b, err, n = float(xs[0]), 0.0, 0.0, 0
    for x in xs[1:]:
        err += abs(x - (l + b))
        n += 1
        nl = round(0.5 * x + 0.5 * (l + b), 12)
        b = round(0.25 * (nl - l) + 0.75 * b, 12)
        l = nl

    reg = load_all()
    out = reg["event_type_holt_forecast"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.event_type == "click"
    assert r.n_hours == len(xs)
    assert r.level_final == round(l, 6)
    assert r.trend_final == round(b, 6)
    assert r.forecast_next == round(l + b, 6)
    assert r.mae_one_step == round(err / n, 6)


def test_expectations_detect_planted_violations(spark, tmp_path):
    """Plant one violation per check and assert each is counted."""
    spark.createDataFrame(
        [
            (1, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "A", "O", dt.date(2026, 1, 2)),
            (1, 1, 1, 2, -2.0, 10.0, 1.5, 0.0, "X", "O", dt.date(2026, 1, 2)),
            (1, 1, 1, 2, 5.0, 10.0, 0.1, 0.0, "N", "O", dt.date(2026, 1, 2)),
            (99, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "R", "O", dt.date(2026, 1, 2)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [
            (1, 7, "O", 10.0, dt.date(2026, 1, 1), "p", 0, "c"),
            (2, 404, "O", -1.0, None, "p", 0, "c"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(7, "Customer#7", "addr", 1, "p", 1.0, "seg", "c")],
        "c_custkey long, c_name string, c_address string, c_nationkey long, "
        "c_phone string, c_acctbal double, c_mktsegment string, "
        "c_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    reg = load_all()
    got = {
        r.check_name: (r.n_checked, r.n_violations, r.passed)
        for r in reg["data_contract_expectations"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["quantity_positive"] == (4, 1, False)
    assert got["discount_in_unit_range"] == (4, 1, False)
    assert got["returnflag_domain"] == (4, 1, False)
    assert got["totalprice_non_negative"] == (2, 1, False)
    assert got["orderdate_not_null"] == (2, 1, False)
    assert got["fk_lineitem_orders"] == (4, 1, False)
    assert got["fk_orders_customer"] == (2, 1, False)
    # key (1,1,1,2) appears twice -> one duplicate key among 3 distinct
    assert got["unique_orderkey_linenumber"] == (3, 1, False)
