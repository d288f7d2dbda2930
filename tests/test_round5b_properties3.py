"""Third brute-force property batch: chi-square cell contributions,
seasonal-naive backtest MAE, k-anonymity classes, and opening-path
top-k, replayed in plain Python on randomized fixtures."""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import Counter, defaultdict

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows, sub="sf"):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        d + "/events.parquet"
    )
    return d


def test_chi2_matches_bruteforce_random(spark, tmp_path):
    random.seed(307)
    base = dt.datetime(2024, 7, 1)  # Monday
    rows, eid = [], 0
    cells = Counter()
    for _ in range(400):
        day = random.randint(0, 13)
        t = random.choice(["view", "click", "purchase"])
        ts = base + dt.timedelta(days=day)
        # Spark dayofweek: 1=Sunday..7; 2024-07-01 is a Monday (=2)
        dow = ((ts.weekday() + 1) % 7) + 1
        cells[(t, dow)] += 1
        eid += 1
        rows.append((eid, ts, 1, t, 1.0, "{}"))
    d = _write_events(spark, tmp_path, rows)
    reg = load_all()
    r = reg["event_type_dow_chi2"][0](spark, d).collect()[0]
    n = sum(cells.values())
    rsum = Counter()
    csum = Counter()
    for (t, dow), o in cells.items():
        rsum[t] += o
        csum[dow] += o
    chi = 0
    for (t, dow), o in cells.items():
        num = (n * o - rsum[t] * csum[dow]) ** 2
        den = n * rsum[t] * csum[dow]
        chi += math.floor(num * 1_000_000 / den)
    assert r.n_cells == len(cells)
    assert r.dof == (len(rsum) - 1) * (len(csum) - 1)
    assert r.chi2_micro == chi


def test_backtest_matches_bruteforce_random(spark, tmp_path):
    random.seed(311)
    base = dt.datetime(2024, 7, 8)
    rows, eid = [], 0
    # 3 train days + 1 test day, random per-(type,hour) intensities
    counts = defaultdict(int)  # (day, type, hod) -> n
    for day in range(4):
        for _ in range(random.randint(30, 60)):
            t = random.choice(["view", "click"])
            h = random.randint(8, 11)
            counts[(day, t, h)] += 1
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=day, hours=h), 1, t, 1.0, "{}")
            )
    d = _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.event_type: (r.n_hours_scored, r.actual_events, r.mae_micro_sum)
        for r in reg["hourly_forecast_backtest"][0](spark, d).collect()
    }
    # brute force
    model = defaultdict(lambda: [0, 0])  # (t, h) -> [sum, n_hours]
    for (day, t, h), n in counts.items():
        if day < 3:
            m = model[(t, h)]
            m[0] += n
            m[1] += 1
    want = defaultdict(lambda: [0, 0, 0])
    for (day, t, h), y in counts.items():
        if day == 3 and (t, h) in model:
            s, nh = model[(t, h)]
            w = want[t]
            w[0] += 1
            w[1] += y
            w[2] += math.floor(abs(s - y * nh) * 1_000_000 / nh)
    assert got == {t: tuple(v) for t, v in want.items()}


def test_k_anonymity_matches_bruteforce_random(spark, tmp_path):
    random.seed(313)
    from decimal import Decimal, ROUND_HALF_UP

    cust = [
        (i, f"Customer#{i:09d}", random.randint(0, 3),
         round(random.uniform(-500, 3500), 2),
         random.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"]))
        for i in range(1, 120)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).write.parquet(d + "/customer.parquet")
    reg = load_all()
    r = reg["k_anonymity_audit"][0](spark, d).collect()[0]

    def band(bal):
        cents = int(
            Decimal(str(bal)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100
        )
        return math.floor(cents / 100000)

    classes = defaultdict(list)
    for _, _, nat, bal, seg in cust:
        classes[(nat, band(bal))].append(seg)
    sizes = {k: len(v) for k, v in classes.items()}
    div = {k: len(set(v)) for k, v in classes.items()}
    assert r.n_classes == len(classes)
    assert r.min_class_size == min(sizes.values())
    assert r.k_violating_classes == sum(1 for s in sizes.values() if s < 5)
    assert r.k_exposed_rows == sum(s for s in sizes.values() if s < 5)
    assert r.l_violating_classes == sum(1 for v in div.values() if v < 2)
    assert r.l_exposed_rows == sum(
        sizes[k] for k, v in div.items() if v < 2
    )


def test_path_trigrams_match_bruteforce_random(spark, tmp_path):
    random.seed(317)
    base = dt.datetime(2024, 7, 20)
    rows, eid = [], 0
    paths = Counter()
    for u in range(60):
        n = random.randint(1, 6)
        seq = [random.choice(["view", "click", "purchase"]) for _ in range(n)]
        if n >= 3:
            paths[">".join(seq[:3])] += 1
        for i, t in enumerate(seq):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(minutes=i), u, t, 1.0, "{}")
            )
    d = _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = [
        (r.path, r.n_users)
        for r in reg["event_path_trigrams"][0](spark, d).collect()
    ]
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
