"""Guard-mutation sweep (VERDICT r9 #6): mutation-test the round-9/10
fixes whose DETECTORS are gates and lifecycle invariants, not the DuckDB
oracle — the oracle sweep (tools/oracle_mutation.py) proves semantic
drift is caught; this tool proves the two non-semantic guards have
teeth:

  A. strip-hint mutant — remove every ``.hint("shuffle_hash")`` from
     doc_unigram_logprob. The result is SEMANTICS-PRESERVING (asserted:
     the mutant's frame hash still equals the DuckDB oracle's), so the
     oracle must NOT kill it; the shuffle gate's broadcast watch MUST:
     the O(vocab) build side reappears as an AQE-chosen broadcast above
     BROADCAST_WATCH at sf0.1 (the exact regression the round-10 pin
     closed).

  B. NULL-safe-erase revert mutant — rewrite delete_keys_bucketed's
     keep-predicate from ``isNull() | ~isin`` back to round-8's
     ``~isin`` (NULL keys silently erased). Killed by the erasure
     accounting assert (rows-deleted != predicate-matched -> abort
     before swap), the same invariant tests/test_bucketed_delete_*
     pin.

Both results are MERGED into tools/ORACLE_MUTATION.json under
``guard_mutants`` so the artifact carries the full kill record; exit 0
iff both mutants are killed by their intended detector and mutant A is
confirmed oracle-invisible.

Usage: python tools/guard_mutation.py [sf_dir(=/root/testdata/sf0.1)]
"""

from __future__ import annotations

import ast
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tools.check_oracle import frame_hash  # noqa: E402
from tools.shuffle_gate import BROADCAST_WATCH, measure  # noqa: E402


def _compile_mutant(fn, transformer: ast.NodeTransformer):
    """Recompile ``fn`` with ``transformer`` applied, decorators stripped,
    against a copy of its module globals (the oracle_mutation mechanics)."""
    import inspect
    import textwrap

    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    fdef = tree.body[0]
    fdef.decorator_list = []
    new_tree = transformer.visit(tree)
    ast.fix_missing_locations(new_tree)
    g = dict(sys.modules[fn.__module__].__dict__)
    code = compile(new_tree, f"<mutant:{fn.__name__}>", "exec")
    exec(code, g)
    return g[fn.__name__], getattr(transformer, "applied", 0)


class _HintStripper(ast.NodeTransformer):
    applied = 0

    def visit_Call(self, node: ast.Call):
        self.generic_visit(node)
        if (
            isinstance(node.func, ast.Attribute)
            and node.func.attr == "hint"
            and node.args
            and isinstance(node.args[0], ast.Constant)
            and node.args[0].value == "shuffle_hash"
        ):
            self.applied += 1
            return node.func.value
        return node


class _NullSafeEraseReverter(ast.NodeTransformer):
    """``X.isNull() | Y`` -> ``Y`` (the round-8 bug, resurrected)."""

    applied = 0

    def visit_BinOp(self, node: ast.BinOp):
        self.generic_visit(node)
        if (
            isinstance(node.op, ast.BitOr)
            and isinstance(node.left, ast.Call)
            and isinstance(node.left.func, ast.Attribute)
            and node.left.func.attr == "isNull"
        ):
            self.applied += 1
            return node.right
        return node


def mutant_a_strip_hint(spark, sf_dir: str) -> dict:
    from shortvideohybridanalyticslakehouse_spark.plans.queries_ext28 import (
        _ORACLE,
        q_doc_unigram_logprob,
    )

    mut, n = _compile_mutant(q_doc_unigram_logprob, _HintStripper())
    assert n >= 1, "no shuffle_hash hint found to strip — mutant is a no-op"

    m = measure(mut(spark, sf_dir))
    gate_killed = m["max_broadcast_bytes"] > BROADCAST_WATCH

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t)}.parquet'"
        )
    oracle_hash = frame_hash(con.execute(_ORACLE).df())
    mutant_hash = frame_hash(mut(spark, sf_dir).toPandas())
    oracle_killed = oracle_hash != mutant_hash

    return {
        "mutant": "strip hint('shuffle_hash') from doc_unigram_logprob",
        "sites_stripped": n,
        "max_broadcast_bytes": m["max_broadcast_bytes"],
        "broadcast_watch": BROADCAST_WATCH,
        "killed_by_shuffle_gate": gate_killed,
        "oracle_killed": oracle_killed,  # must be False: semantics equal
        "killed": gate_killed and not oracle_killed,
    }


def mutant_b_nullsafe_revert(spark) -> dict:
    from shortvideohybridanalyticslakehouse_spark.plans import ddl

    mut, n = _compile_mutant(
        ddl.delete_keys_bucketed, _NullSafeEraseReverter()
    )
    assert n >= 1, "no isNull() | ... predicate found — mutant is a no-op"

    table = "guard_mutation_erase_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # 56 DISTINCT non-NULL keys over 4 buckets (plus a NULL every 8th
    # row): erasing all 56 touches every bucket, so the NULL rows
    # necessarily co-reside in a rewritten bucket, where the reverted
    # predicate silently drops them and the accounting assert
    # (deleted != matched) must abort the swap
    rows = spark.range(0, 64).select(
        F.when(F.col("id") % 8 == 7, None)
        .otherwise(F.col("id"))
        .cast("bigint")
        .alias("video_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias(
            "minute"
        ),
        (F.col("id") % 5).cast("double").alias("n"),
    )
    ddl.write_bucketed_sorted_table(
        rows, table, "video_id", ["minute"], n_buckets=4
    )
    vals = [i for i in range(64) if i % 8 != 7]
    killed = False
    detail = None
    try:
        mut(spark, table, "video_id", vals, ["minute"])
    except RuntimeError as e:
        killed = "accounting mismatch" in str(e)
        detail = str(e)[:160]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    return {
        "mutant": "revert NULL-safe erase keep-predicate (isNull()|~isin"
        " -> ~isin) in delete_keys_bucketed",
        "sites_reverted": n,
        "killed_by_accounting_assert": killed,
        "detail": detail,
        "killed": killed,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from shortvideohybridanalyticslakehouse_spark.session import get_spark

    spark = get_spark("svh-guard-mutation")
    spark.sparkContext.setLogLevel("ERROR")

    results = {
        "strip_shuffle_hash_hint": mutant_a_strip_hint(spark, sf_dir),
        "nullsafe_erase_revert": mutant_b_nullsafe_revert(spark),
    }
    ok = all(r["killed"] for r in results.values())
    path = os.path.join(_REPO, "tools", "ORACLE_MUTATION.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["guard_mutants"] = results
    kills = sum(1 for r in results.values() if r["killed"])
    doc["guard_kill_rate"] = kills / len(results)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for name, r in results.items():
        print(f"{name}: killed={r['killed']} {r}")
    print(f"{'PASS' if ok else 'FAIL'} -> {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
