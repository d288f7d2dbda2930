"""Golden self-regression pins for the rows-only JVM-sketch queries
(VERDICT r7 #2).

``weekly_hll_union_estimate`` / ``value_percentiles_approx`` use
JVM-internal sketches DuckDB cannot replay, so the oracle harness only
row-counts them. Their output is deterministic for fixed input + Spark
build, so tools/sketch_pins.json pins the full frame hash per SF; this
test replays the sf0.001 pins on every CI run (the close ritual's
driver_env_check covers sf0.01/sf0.1 through the same artifact), so a
silent value drift across Spark upgrades fails loudly.
"""

from __future__ import annotations

import pytest

from tools.check_oracle import frame_hash
from tools.sketch_pins import PINNED, load_pins

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", PINNED)
def test_sketch_pin_holds(spark, name):
    from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

    pins = load_pins()
    pin = pins.get(name, {}).get("sf0.001")
    assert pin is not None, (
        f"no sf0.001 pin for {name} — run "
        "python tools/sketch_pins.py --record /root/testdata/sf0.001"
    )
    fn, _oracle = load_all()[name]
    n, cols, h = frame_hash(fn(spark, SF_DIR).toPandas())
    assert {"rows": int(n), "cols": list(cols), "hash": h} == pin, (
        f"{name} drifted from its golden pin — if the change is a "
        "deliberate Spark upgrade, re-record with tools/sketch_pins.py"
    )


def test_every_no_oracle_query_is_pinned():
    """The PINNED list must stay exhaustive: any future no-oracle query
    needs a pin (or this test forces the decision to be explicit)."""
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs - oracles == set(PINNED)
