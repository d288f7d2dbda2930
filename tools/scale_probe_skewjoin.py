"""Skew probe for the shuffle_hash-pinned vocabulary joins (VERDICT r9
#3): ShuffledHashJoin has no sort-merge spill fallback and AQE's
skew-join mitigation does NOT split hash-join build partitions — so a
Zipf-heavy token (exactly what real vocabularies have) is the failure
mode to measure, not argue about.

The claim under test: the pinned lanes are skew-SAFE because their
build sides are COUNT frames — one row per distinct key — so token
frequency skew lands entirely on the PROBE side, which ShuffledHashJoin
streams (never holds in memory). A Zipf hot key therefore produces a
wall-clock straggler at worst, never an executor OOM. This probe makes
that measurable:

  1. generates an adversarial Zipf(~1) corpus Spark-natively (inverse-
     CDF ranks via xxhash64-derived uniforms — deterministic, no driver
     lists): ~80 tokens/doc over a vocab that GROWS with the corpus,
     top token ~8% of ALL occurrences;
  2. runs the REAL registered queries (doc_unigram_logprob,
     perplexity_bucket_mixture, bigram_lm_surprise) against it at 1x
     and 10x;
  3. records per-partition row counts for the build (vocab counts) and
     probe (occurrences) sides at the join's hash partitioning, plus
     the executed plan's join node, wall time, and max broadcast bytes.

PASS criteria (asserted into the artifact): the join stays
ShuffledHashJoin at both factors, max broadcast stays 0 for the pinned
joins, and the BUILD side's hottest partition holds O(vocab/partitions)
rows (balance ratio max/median < 2) even though the PROBE side's
hottest partition carries the Zipf head.

Usage: python tools/scale_probe_skewjoin.py [base_docs]
Artifact: tools/SKEW_PROBE_SHJ.json (+ a PLANS.md row, committed).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark

# query -> the pinned join node its plan must carry. Count-frame build
# sides (1 tiny row per key) pin shuffle_hash; the HIGH-VOLUME
# distinct-shingle index pins sort-merge — this probe's 10x run OOM'd
# the spill-less ShuffledHashJoin hash map on 36M shingles, the
# measured reason for the merge pin.
QUERIES = {
    "doc_unigram_logprob": "ShuffledHashJoinExec",
    "perplexity_bucket_mixture": "ShuffledHashJoinExec",
    "bigram_lm_surprise": "ShuffledHashJoinExec",
    "kl_source_drift": "ShuffledHashJoinExec",
    "shingle_contamination_audit": "SortMergeJoinExec",
    # r11 additions (VERDICT r10 #4): the round-10 merge-pinned
    # volume-build lanes the probe had not yet covered. The novelty
    # lane's first-seen index is the same distinct-shingle class that
    # OOM'd the spill-less SHJ at 36M shingles — the merge pin must
    # hold under the Zipf-with-copies corpus.
    "shingle_temporal_novelty": "SortMergeJoinExec",
    # r11: exact-substring dedup — the merge-pinned shared-anchor
    # semi-join (volume build) plus the per-bucket suffix-array kernel
    # under Zipf-with-copies (the 2% verbatim copiers are exactly the
    # fully-covered-doc hot case)
    "exact_substring_spans": "SortMergeJoinExec",
    # r11: image perceptual-hash near-dup — the merge-pinned band
    # self-join over dHashes of synthesized-from-doc_id payloads (the
    # probe corpus's doc ids exercise the planted re-encode density)
    "raster_dhash_near_dup": "SortMergeJoinExec",
}
TOKENS_PER_DOC = 80
PARTS = 32


def write_zipf_corpus(spark, out_dir: str, n_docs: int, vocab: int) -> None:
    """Zipf(~1) ranks via inverse CDF: rank = floor(vocab^u) with u
    uniform — P(rank <= r) = ln r / ln V, i.e. p(r) ~ 1/r. Token ids are
    't<rank>'; rank 1 is the hot head (~1/ln(V) of all occurrences)."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pos = F.explode(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1))
    ).alias("pos")
    occ = docs.select("doc_id", pos)
    # 2% of docs copy their predecessor verbatim (seed = donor id) so
    # shingle-overlap lanes have real join work — otherwise AQE's
    # empty-relation propagation erases the join entirely and the probe
    # asserts against a vacuous plan
    seed = F.when(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    u = (
        F.abs(F.xxhash64(seed, F.col("pos"), F.lit("zipf")))
        % F.lit(1_000_000)
    ).cast("double") / 1_000_000.0
    rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("bigint")
    toks = occ.select(
        "doc_id", "pos", F.concat(F.lit("t"), rank.cast("string")).alias("tok")
    )
    text = (
        toks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("text")
        )
        .select(
            "doc_id",
            "text",
            F.lit("xx").alias("lang"),
            (F.col("doc_id") % 4).cast("string").alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    text.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def partition_balance(df, key_cols: list[str]) -> dict:
    """Row-count distribution over the join's hash partitioning."""
    counts = sorted(
        r.n
        for r in df.repartition(PARTS, *[F.col(c) for c in key_cols])
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    med = counts[len(counts) // 2] if counts else 0
    return {
        "partitions": len(counts),
        "max_rows": counts[-1] if counts else 0,
        "median_rows": med,
        "balance_ratio": round(counts[-1] / med, 3) if med else None,
    }


def walk_join_metrics(node, acc) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        walk_join_metrics(node.executedPlan(), acc)
        return
    if cls.endswith("QueryStageExec"):
        walk_join_metrics(node.plan(), acc)
        return
    if "Join" in cls:
        acc.setdefault("join_nodes", []).append(cls)
    if cls == "ShuffledHashJoinExec":
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "buildDataSize":
                acc["build_data_size"] = acc.get("build_data_size", 0) + int(
                    kv._2().value()
                )
    if cls == "BroadcastExchangeExec":
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "dataSize":
                acc["max_broadcast"] = max(
                    acc.get("max_broadcast", 0), int(kv._2().value())
                )
    ch = node.children()
    for i in range(ch.length()):
        walk_join_metrics(ch.apply(i), acc)


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    registry = load_all()
    spark = get_spark("svh-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"base_docs": base, "tokens_per_doc": TOKENS_PER_DOC, "factors": {}}
    ok = True
    for factor in (1, 10):
        n_docs = base * factor
        vocab = max(50_000, n_docs)  # vocab grows with the corpus
        d = f"/tmp/svh_skewprobe_{factor}x"
        write_zipf_corpus(spark, d, n_docs, vocab)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        occ = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), " ", -1)).alias(
                "tok"
            )
        )
        counts = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
        head = counts.orderBy(F.desc("n_tok")).limit(1).collect()[0]
        frow = {
            "n_docs": n_docs,
            "vocab_target": vocab,
            "distinct_tokens": counts.count(),
            "hot_token_share": round(
                head.n_tok / (n_docs * TOKENS_PER_DOC), 4
            ),
            "probe_side_balance": partition_balance(occ, ["tok"]),
            "build_side_balance": partition_balance(counts, ["tok"]),
            "queries": {},
        }
        for qname in QUERIES:
            fn, _ = registry[qname]
            t0 = time.time()
            df = fn(spark, d)
            df.collect()
            wall = round(time.time() - t0, 2)
            acc: dict = {}
            walk_join_metrics(df._jdf.queryExecution().executedPlan(), acc)
            expected = QUERIES[qname]
            pinned_ok = expected in acc.get("join_nodes", [])
            qrow = {
                "wall_sec": wall,
                "join_nodes": sorted(set(acc.get("join_nodes", []))),
                "expected_join": expected,
                "pinned_join_present": pinned_ok,
                "build_data_size": acc.get("build_data_size", 0),
                "max_broadcast_bytes": acc.get("max_broadcast", 0),
            }
            frow["queries"][qname] = qrow
            if not pinned_ok:
                ok = False
            print(f"{factor}x {qname}: {qrow}")
        # streaming contamination firewall STATIC LEG (VERDICT r10 #4):
        # Structured Streaming gives every micro-batch full Catalyst
        # planning, so this batch stand-in join measures the identical
        # per-batch plan the firewall runs. The frozen train index is a
        # distinct-shingle VOLUME build side (the class that OOM'd the
        # spill-less SHJ at 36M shingles) — the merge pin must hold
        # under the Zipf-with-copies corpus.
        from shortvideohybridanalyticslakehouse_spark.streaming.contamination import (  # noqa: E501,PLC0415
            doc_shingles,
            train_shingle_index,
        )

        # split so the corpus's verbatim copiers (doc_id % 50 == 0,
        # donors at doc_id-1) land in the BATCH with their donors in
        # train — the firewall must flag them (real join matches)
        train = docs.filter(F.col("doc_id") % 10 != 0)
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        t0 = time.time()
        flagged = (
            doc_shingles(batch)
            .join(train_shingle_index(train).hint("merge"), "shingle")
            .select("doc_id", "source")
            .dropDuplicates(["doc_id"])
        )
        n_flagged = len(flagged.collect())
        acc_fw: dict = {}
        walk_join_metrics(
            flagged._jdf.queryExecution().executedPlan(), acc_fw
        )
        fw_pinned = "SortMergeJoinExec" in acc_fw.get("join_nodes", [])
        frow["queries"]["contamination_firewall_static_leg"] = {
            "wall_sec": round(time.time() - t0, 2),
            "n_flagged": n_flagged,
            "join_nodes": sorted(set(acc_fw.get("join_nodes", []))),
            "expected_join": "SortMergeJoinExec",
            "pinned_join_present": fw_pinned,
            "max_broadcast_bytes": acc_fw.get("max_broadcast", 0),
        }
        if not fw_pinned or n_flagged == 0:
            ok = False
        print(
            f"{factor}x contamination_firewall_static_leg: "
            f"{frow['queries']['contamination_firewall_static_leg']}"
        )
        bal = frow["build_side_balance"]["balance_ratio"]
        if bal is None or bal >= 2.0:
            ok = False
        print(
            f"{factor}x corpus: hot token {frow['hot_token_share']:.1%} of "
            f"occurrences; build balance {bal}; probe balance "
            f"{frow['probe_side_balance']['balance_ratio']}"
        )
        out["factors"][f"{factor}x"] = frow
        shutil.rmtree(d, ignore_errors=True)
    out["pass"] = ok
    path = os.path.join(_REPO, "tools", "SKEW_PROBE_SHJ.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{'PASS' if ok else 'FAIL'} -> {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
