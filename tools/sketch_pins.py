"""Golden self-regression pins for the rows-only JVM-sketch queries
(VERDICT r7 #2).

``weekly_hll_union_estimate`` and ``value_percentiles_approx`` call
JVM-internal sketches (``approx_count_distinct``, ``percentile_approx``)
that DuckDB cannot replay, so the oracle harness only row-counts them —
the last hash-unchecked surface in the registry. Their output IS
deterministic for a fixed input + Spark build, so we pin the full
frame hash per scale factor as a committed artifact and fail loudly if
a Spark upgrade (or an accidental plan change) drifts the values.

Usage:
    python tools/sketch_pins.py --record sf_dir [sf_dir ...]  # (re)pin
    python tools/sketch_pins.py sf_dir [sf_dir ...]           # verify

The close-of-round ritual gets the check for free: driver_env_check
consults the artifact for any no-oracle query and turns its weak
rows-only line into a full rows+cols+hash compare wherever a pin exists.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

ARTIFACT = os.path.join(_REPO, "tools", "sketch_pins.json")

# every registry query with no oracle_sql twin (the rows-only set)
PINNED = ["weekly_hll_union_estimate", "value_percentiles_approx"]


def load_pins() -> dict:
    if not os.path.exists(ARTIFACT):
        return {}
    with open(ARTIFACT) as f:
        return json.load(f)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _measure(spark, sf_dir: str) -> dict[str, dict]:
    from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
    from tools.check_oracle import frame_hash

    registry = load_all()
    out = {}
    for name in PINNED:
        fn, _oracle = registry[name]
        n, cols, h = frame_hash(fn(spark, sf_dir).toPandas())
        out[name] = {"rows": int(n), "cols": list(cols), "hash": h}
    return out


def main() -> int:
    record = "--record" in sys.argv
    sf_dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.01"
    ]
    # the driver's vanilla session, not the engine factory — pins must
    # hold in the environment the correctness gate runs under
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("sketch-pins")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    pins = load_pins()
    failures = []
    for sf_dir in sf_dirs:
        tag = _sf_tag(sf_dir)
        cur = _measure(spark, sf_dir)
        for name, m in cur.items():
            if record:
                pins.setdefault(name, {})[tag] = m
                print(f"PINNED {name}@{tag}: rows={m['rows']} hash={m['hash']}")
            else:
                want = pins.get(name, {}).get(tag)
                if want is None:
                    failures.append(f"{name}@{tag}: no pin recorded")
                    print(f"FAIL {name}@{tag}: no pin recorded")
                elif want != m:
                    failures.append(
                        f"{name}@{tag}: drift {want['hash']} -> {m['hash']}"
                    )
                    print(
                        f"FAIL {name}@{tag}: rows={m['rows']}/{want['rows']}"
                        f" hash {want['hash']} -> {m['hash']}"
                    )
                else:
                    print(f"PASS {name}@{tag}: rows={m['rows']} hash={m['hash']}")
    if record:
        with open(ARTIFACT, "w") as f:
            json.dump(pins, f, indent=1, sort_keys=True)
        print(f"WROTE {ARTIFACT}")
        return 0
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
