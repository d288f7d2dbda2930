"""Physical-plan audit generator backing PLANS.md.

For every registry query (or a named subset), builds the DataFrame
against a scale dir and reports measurable plan features:

  - join operators used (BHJ / SMJ / SHJ / BNLJ / cartesian)
  - number of Exchange (shuffle) operators
  - number of WholeStageCodegen spans
  - scan ReadSchema column counts and whether any filter was pushed
  - whether TakeOrderedAndProject / WindowGroupLimit top-k shapes appear

Usage:
    python tools/plan_audit.py /root/testdata/sf0.01 [query ...]

Prints one markdown table row per query — paste-ready for PLANS.md.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)
ABBREV = {
    "BroadcastHashJoin": "BHJ",
    "SortMergeJoin": "SMJ",
    "ShuffledHashJoin": "SHJ",
    "BroadcastNestedLoopJoin": "BNLJ",
    "CartesianProduct": "CART",
}


def audit_one(spark, name: str, fn, sf_dir: str) -> str:
    try:
        df = fn(spark, sf_dir)
        df.collect()  # finalize AQE so the audited plan is the EXECUTED one
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AdaptiveSparkPlan prints "final +- == Initial Plan ==" — audit
        # only the final section or every feature double-counts
        plan = plan.split("== Initial Plan ==")[0]
    except Exception as e:  # pragma: no cover - diagnostic path
        return f"| {name} | ERROR: {str(e)[:80]} | | | |"
    joins = [ABBREV[j] for j in JOIN_RE.findall(plan)]
    join_txt = "+".join(sorted(set(joins), key=joins.index)) or "—"
    # real shuffles only: ReusedExchange re-reads an existing shuffle's
    # files (no new exchange work), and its name CONTAINS "Exchange" so a
    # naive substring count overstates lazy multi-branch plans badly
    n_reused = plan.count("ReusedExchange")
    n_exchange = plan.count("Exchange") - n_reused
    # codegen stages appear as "*(n)" prefixes in the compact plan string
    n_wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
    n_scans = plan.count("ReadSchema")
    # toString truncates long scan lines, so count non-empty marker only
    pushed = plan.count("PushedFilters: [") - plan.count("PushedFilters: []")
    topk = []
    if "TakeOrderedAndProject" in plan:
        topk.append("TopK")
    if "WindowGroupLimit" in plan:
        topk.append("WinGroupLimit")
    return (
        f"| {name} | {join_txt} | {n_exchange}"
        f"{f' (+{n_reused} reused)' if n_reused else ''} | {n_wscg} | "
        f"{n_scans} scans / {pushed} pushed | {'+'.join(topk) or '—'} |"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    registry = load_all()
    if names:
        missing = [n for n in names if n not in registry]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        items = [(n, registry[n][0]) for n in names]
    else:
        items = [(n, fn) for n, (fn, _) in registry.items()]
    spark = get_spark("svh-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | joins | exchanges | codegen spans | scans | top-k |")
    print("|---|---|---|---|---|---|")
    for name, fn in items:
        print(audit_one(spark, name, fn, sf_dir))


if __name__ == "__main__":
    main()
