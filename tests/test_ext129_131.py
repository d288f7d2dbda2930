"""Planted-fixture tests for the round-9 lanes (ext129/130/131): each
query gets a hand-constructed corpus where the expected answer is known
by design, independent of the DuckDB oracle."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _write_embeddings(spark, tmp_path, rows, dim=4):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _vec(*pairs, dim=4):
    v = [0.0] * dim
    for i, x in pairs:
        v[i] = x
    return v


# ---------------------------------------------------------------- ext129


def test_knn_label_noise_flags_planted_flip(spark, tmp_path):
    """Six vectors in two tight clusters; one carries the wrong label —
    its 5-NN majority disagrees, nothing else is flagged."""
    rows = [
        (0, _vec((0, 1.0)), 1),
        (1, _vec((0, 0.99), (1, 0.01)), 1),
        (2, _vec((0, 0.98), (1, 0.02)), 1),
        (3, _vec((0, 0.97), (1, 0.03)), 2),  # planted label flip
        (4, _vec((2, 1.0)), 1),
        (5, _vec((2, 0.99), (3, 0.01)), 1),
    ]
    _write_embeddings(spark, tmp_path, rows)
    out = {
        r.label: (r.n_vecs, r.n_flagged)
        for r in REG["knn_label_noise_audit"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[2] == (1, 1)  # the flipped vector is flagged
    assert out[1][1] == 0  # no false positives among the majority label


def test_knn_candidate_recall_floor_vs_exact():
    """Round-10 rework contract: the SimHash band candidates must retain
    >=0.9 of the TRUE (brute-force) 5-NN pairs on the sf0.001 fixture —
    whose random unit vectors are the adversarial WORST case for
    locality hashing (measured 0.977 when the floor was set). Uses the
    exact _KNN_PLANES the query plans with, so a plane/banding change
    that silently destroys recall fails here."""
    import numpy as np
    import duckdb

    from shortvideohybridanalyticslakehouse_spark.plans.queries_ext129 import (
        _KNN_BANDS,
        _KNN_BAND_BITS,
        _KNN_K,
        _KNN_PLANES,
    )

    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        "'/root/testdata/sf0.001/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    V = np.array(
        [
            np.floor(np.array(r[1], dtype=np.float64) * 1e6 + 0.5).astype(
                np.int64
            )
            for r in rows
        ]
    )
    n = len(ids)
    sims = V @ V.T
    true_pairs = set()
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )
        true_pairs.update((i, j) for j in order[:_KNN_K])

    H = np.array(_KNN_PLANES)[:, : V.shape[1]]
    proj = (V @ H.T) >= 0
    buckets: dict = {}
    for i in range(n):
        for b in range(_KNN_BANDS):
            bits = tuple(proj[i, b * _KNN_BAND_BITS : (b + 1) * _KNN_BAND_BITS])
            buckets.setdefault((b, bits), []).append(i)
    cands = set()
    for members in buckets.values():
        cands.update(
            (i, j) for i in members for j in members if i != j
        )
    recall = len(true_pairs & cands) / len(true_pairs)
    assert recall >= 0.9, f"5-NN candidate recall {recall:.4f} < 0.9"


def test_kcenter_picks_farthest_point_second(spark, tmp_path):
    """Seed is vec_id 0; the planted far-away point must be round 2."""
    rows = [
        (0, _vec((0, 1.0)), 0),
        (1, _vec((0, 0.9)), 0),
        (2, _vec((0, 0.8)), 0),
        (7, _vec((1, 9.0)), 0),  # far cluster
    ]
    _write_embeddings(spark, tmp_path, rows)
    out = sorted(
        REG["kcenter_coreset_greedy"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r["round"],
    )
    assert out[0]["vec_id"] == 0 and out[0]["dist_sq"] == 0
    assert out[1]["vec_id"] == 7  # farthest from the seed
    assert out[1]["dist_sq"] > out[2]["dist_sq"] >= 0


def test_bh_fdr_rejects_planted_hot_segment(spark, tmp_path):
    """One (dow, bucket) segment converts at 90% vs ~2% everywhere else;
    BH at q=0.10 must reject it and keep a flat segment."""
    rows = []
    eid = 0
    # 14 flat segments across two weeks-worth of days
    for day in range(14):
        for i in range(50):
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(days=day, hours=i % 24),
                    i,
                    "purchase" if i == 0 else "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    # the hot segment: Monday 00-05 (dow=2 in Spark, hour_bucket=0)
    for i in range(50):
        rows.append(
            (
                eid,
                T0 + dt.timedelta(hours=i % 6),  # 2024-01-01 is a Monday
                1000 + i,
                "purchase" if i < 45 else "view",
                1.0,
                "{}",
            )
        )
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = REG["bh_fdr_segment_lift"][0](spark, str(tmp_path)).collect()
    hot = [r for r in out if r.dow == 2 and r.hour_bucket == 0]
    assert hot and all(r.rejected for r in hot)
    flat = [r for r in out if r.p_rank == max(x.p_rank for x in out)]
    assert all(not r.rejected for r in flat)


def test_hits_star_graph(spark, tmp_path):
    """One part bought by every customer must be the top authority; one
    customer buying everything must be the top hub. Builds orders +
    lineitem fixtures."""
    custs = list(range(1, 6))
    parts = list(range(100, 105))
    orders = [(ok, c) for ok, c in enumerate(custs, start=1)]
    orders.append((99, 5))  # the omnivore customer's big order
    li = []
    for ok, c in enumerate(custs, start=1):
        li.append((ok, 100))  # everyone buys part 100
        li.append((ok, 100 + c % 3 + 1))
    for p in parts:
        li.append((99, p))  # customer 5 buys everything
    spark.createDataFrame(
        [(ok, c, "O", 1.0, T0, "1-URGENT") for ok, c in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(ok, p) for ok, p in li], "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = REG["hits_hubs_authorities"][0](spark, str(tmp_path)).collect()
    top_auth = next(
        r for r in out if r.role == "authority" and r.rank == 1
    )
    top_hub = next(r for r in out if r.role == "hub" and r.rank == 1)
    assert top_auth.node_key == 100
    assert top_auth.score_micro == 1_000_000  # max-normalized
    assert top_hub.node_key == 5


def test_readability_counts(spark, tmp_path):
    """Hand-checked counts: 'the cat sat. it ran!' = 5 words, 2
    sentences, vowel groups the(1) cat(1) sat(1) it(1) ran(1) = 5."""
    spark.createDataFrame(
        [(1, "the cat sat. it ran!", "s1", "en")],
        "doc_id long, text string, source string, lang string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = REG["readability_by_source"][0](spark, str(tmp_path)).collect()[0]
    assert (r.words, r.sentences, r.syllables) == (5, 2, 5)
    # FK = 0.39*(5/2) + 11.8*(5/5) - 15.59 = -2.815
    assert r.fk_grade_micro == -2_815_000


# ---------------------------------------------------------------- ext130


def test_esd_flags_planted_outlier_first(spark, tmp_path):
    """29 days at ~100 events, one day at 500 — ESD round 1 must remove
    the spike."""
    rows = []
    eid = 0
    for day in range(30):
        n = 500 if day == 7 else 100 + (day % 3)
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=i), i, "view",
                 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = sorted(
        REG["esd_outlier_days"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r["round"],
    )
    assert out[0]["day"].day == 8  # Jan 8 == day index 7
    assert out[0]["n_events"] == 500
    assert out[0]["z_micro"] > out[1]["z_micro"]


def test_sprt_crosses_on_planted_surge(spark, tmp_path):
    """A front-loaded surge (30% for 10 days, then 2%): because the H0
    rate is the FULL-period mean, the final cumulative LLR is always
    <= 0, so reject_h0 can only happen via an early upper crossing —
    which this fixture forces (per-surge-day LLR ~ +2.75, bound 2.944,
    so day 2 crosses). The decision must latch there and survive the
    low-rate tail."""
    rows = []
    eid = 0
    for day in range(20):
        rate = 30 if day < 10 else 2  # purchases per 100 events
        for i in range(100):
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(days=day, minutes=i),
                    i,
                    "purchase" if i < rate else "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = sorted(
        REG["sprt_conversion_monitor"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    decisions = [r.decision for r in out]
    assert decisions[0] == "continue"  # day 1: +2.75 < 2.944
    assert decisions[1] == "reject_h0"  # day 2: +5.51 crosses
    assert all(d == "reject_h0" for d in decisions[1:])  # latched
    assert out[-1].cum_llr_micro < 0  # tail dives, decision unchanged


def test_seasonal_strength_extremes(spark, tmp_path):
    """'seasonal' type follows its hour exactly (strength ~1);
    'flat' type is hour-independent noise-free constant (variance of
    detrended is 0 -> remainder 0 too; guard) — use alternating values
    uncorrelated with hour for a low-strength lane."""
    rows = []
    eid = 0
    for day in range(4):
        for hr in range(24):
            rows.append(
                (eid, T0 + dt.timedelta(days=day, hours=hr), 1,
                 "seasonal", float(hr), "{}")
            )
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(days=day, hours=hr), 2,
                 "noisy", float((eid * 7) % 13), "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r.seasonal_strength_micro
        for r in REG["seasonal_strength_by_type"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["seasonal"] == 1_000_000  # hour explains everything
    assert out["noisy"] < 500_000


def test_column_profile_entropy(spark, tmp_path):
    """Uniform 2-value status has ln(2) entropy; constant priority has
    0 entropy and top share 1."""
    rows = [
        (i, i, "O" if i % 2 == 0 else "F", 1.0, T0, "1-URGENT")
        for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.col_name: r
        for r in REG["orders_column_profile"][0](
            spark, str(tmp_path)
        ).collect()
    }
    st = out["o_orderstatus"]
    assert st.n_distinct == 2 and st.top_share_micro == 500_000
    assert abs(st.entropy_micro - 693_146) <= 2  # ln 2 in micro, floored
    pr = out["o_orderpriority"]
    assert pr.n_distinct == 1 and pr.top_share_micro == 1_000_000
    assert pr.entropy_micro == 0


def test_good_turing_singleton_mass(spark, tmp_path):
    """'a a b c' -> N=4, vocab=3, n1=2 (b, c), n2=1 (a); unseen mass =
    2*1e6 // 4 = 500000."""
    spark.createDataFrame(
        [(1, "a a b c", "s1", "en")],
        "doc_id long, text string, source string, lang string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = REG["good_turing_unseen_mass"][0](spark, str(tmp_path)).collect()[0]
    assert (r.n_tokens, r.vocab, r.n1, r.n2) == (4, 3, 2, 1)
    assert r.unseen_mass_micro == 500_000


# ---------------------------------------------------------------- ext131


def test_brier_identity_and_bounds(spark, tmp_path):
    """Murphy identity: brier ~= reliability - resolution + uncertainty
    (within flooring slack of the bin count); all components bounded."""
    rows = []
    for i in range(400):
        rows.append(
            (i, T0 + dt.timedelta(minutes=i), i,
             "purchase" if i % 4 == 0 else "view", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    r = REG["brier_decomposition"][0](spark, str(tmp_path)).collect()[0]
    assert 0 <= r.uncertainty_micro <= 250_000  # p(1-p) <= 1/4
    assert r.reliability_micro >= 0 and r.resolution_micro >= 0
    # generalized decomposition closes exactly up to per-bin flooring
    approx = (
        r.reliability_micro
        - r.resolution_micro
        + r.uncertainty_micro
        + r.within_bin_term_micro
    )
    assert abs(r.brier_micro - approx) <= 31  # <=1 micro floor per term


def test_binseg_finds_planted_shift(spark, tmp_path):
    """Counts 100,100,...,100 then 300,...: split 1 must land on the
    last low day."""
    rows = []
    eid = 0
    for day in range(20):
        n = 100 if day < 12 else 300
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=i % 1440), i,
                 "view", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = sorted(
        REG["binseg_daily_changepoints"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r.split_rank,
    )
    assert out[0].day.day == 12  # Jan 12 = last low day (idx 12)
    assert out[0].cost_micro == 0  # both segments are constant


def test_gini_flags_separating_threshold(spark, tmp_path):
    """Low values never convert, high values always convert — the
    separating decile must be flagged best with gini 0."""
    rows = []
    for i in range(200):
        v = 1.0 if i < 100 else 9.0
        rows.append(
            (i, T0 + dt.timedelta(minutes=i), i,
             "purchase" if v > 5 else "view", v, "{}")
        )
    _write_events(spark, tmp_path, rows)
    out = REG["gini_best_split"][0](spark, str(tmp_path)).collect()
    best = [r for r in out if r.is_best]
    assert len(best) == 1
    assert best[0].gini_micro == 0  # perfect separation
    assert best[0].n_l == 100 and best[0].n_r == 100


# ---------------------------------------------------------------- ext132


def test_croston_hand_fold(spark, tmp_path):
    """Part 1 demands [4,0,0,8,0,0] over six weeks (alpha = 1/8):
    z = 0.875*4 + 0.125*8 = 4.5, p = 0.875*1 + 0.125*3 = 1.25,
    forecast = 3.6. Part 2's single last-week demand pins the calendar
    end and gets z = 3, p = 6."""
    mondays = [dt.datetime(2024, 1, 1) + dt.timedelta(weeks=w)
               for w in range(6)]
    orders = [
        (1, 1, "O", 1.0, mondays[0], "1-URGENT"),
        (2, 1, "O", 1.0, mondays[3], "1-URGENT"),
        (3, 2, "O", 1.0, mondays[5], "1-URGENT"),
    ]
    li = [(1, 101, 4.0), (2, 101, 8.0), (3, 202, 3.0)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.part: r
        for r in REG["croston_intermittent_forecast"][0](
            spark, str(tmp_path)
        ).collect()
    }
    p1 = out[101]
    assert (p1.n_weeks, p1.n_demand_weeks) == (6, 2)
    assert p1.z_size == 4.5 and p1.p_interval == 1.25
    assert p1.forecast_per_week == 3.6
    p2 = out[202]
    assert p2.z_size == 3.0 and p2.p_interval == 6.0
    assert p2.forecast_per_week == 0.5


def test_ljung_box_alternating_series(spark, tmp_path):
    """A strict period-2 series has r_1 ~ -1: Q must be far above the
    ~14 (micro: 14e6) chi-square(7) 95% cutoff — i.e. the statistic
    detects the autocorrelation a flat-noise series wouldn't show."""
    rows = []
    eid = 0
    for day in range(24):
        n = 100 if day % 2 == 0 else 300
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=i % 1440), i,
                 "view", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = REG["ljung_box_daily_q"][0](spark, str(tmp_path)).collect()[0]
    assert r.n_days == 24 and r.n_lags == 7
    assert r.q_micro > 50_000_000  # >> chi2_7 at any sane alpha


def test_bucket_top5_block_chunking_equals_full_gemm():
    """The block-chunked GEMM (ADVICE r10: cap per-task memory at
    O(block x m)) must emit exactly the rows a single full-matrix pass
    emits — forced multi-block via block_cap=1 vs one big block."""
    import numpy as np
    import pandas as pd

    from shortvideohybridanalyticslakehouse_spark.plans.queries_ext129 import (
        _bucket_top5,
    )

    rng = np.random.RandomState(7)
    m, dim = 50, 8
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype=np.int64),
            "label": rng.randint(0, 3, m).astype(np.int64),
            "v": [rng.randint(-100, 100, dim).astype(np.int64)
                  for _ in range(m)],
        }
    )
    full = _bucket_top5(pdf, block_cap=4096).reset_index(drop=True)
    chunked = _bucket_top5(pdf.copy(), block_cap=1).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, chunked)
    assert len(full) == m * 5
