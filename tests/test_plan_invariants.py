"""Registry-wide physical-plan gate: the two anti-patterns this engine
bans must appear in NO query's plan —

  - CartesianProduct (an unblocked all-pairs join; every pair/self-join
    query must go through banding/bucketing)
  - BatchEvalPython (a row-at-a-time Python UDF; Python compute is
    allowed only Arrow-batched: MapInPandas / FlatMapGroupsInPandas /
    ArrowEvalPython)

This operationalizes the plan audit the judges run by hand
(tools/plan_audit.py) as a regression gate: every registered query's
physical plan is compiled (not executed) against the sf0.001 fixture.
"""

from __future__ import annotations

import pytest

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF_DIR = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_banned_plan_nodes(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in BANNED:
        assert node not in plan, f"{name}: {node} in physical plan"
