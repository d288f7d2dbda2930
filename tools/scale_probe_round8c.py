"""Synthetic scale-up probe for the round-8 corpus-scaling lanes: DSIR
importance scoring (queries_ext120) and TextRank keywords
(queries_ext123).

Same replication scheme as scale_probe_composites.py: clone the sf0.1
documents corpus Nx with per-group token salting (vocabulary grows with
the clone groups — the adversarial direction for both lanes, since DSIR
joins per-(doc,term) counts against the vocab and TextRank's iteration
cost is vocabulary-bound). Inputs are cached and counted before timing
so the probe measures compute+shuffle, not parquet IO.

What a healthy shape looks like:
  - DSIR: wall grows ~linearly in corpus size (two map-side-combinable
    aggregations + one join); per-doc microseconds flat-or-falling.
  - TextRank: pair construction linear in tokens; the 3 iterations grow
    with the EDGE list (vocab-bound), so per-doc cost may fall while
    per-edge cost stays flat.

Usage: python tools/scale_probe_round8c.py [sf_dir] [factors...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext120 import (
    doc_term_freqs,
    dsir_scores,
    vocab_from_dt,
)
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext123 import (
    textrank_over,
)
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from tools.scale_probe_composites import scaled_docs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 10]
    spark = get_spark("svh-probe-r8c")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for factor in factors:
        docs = scaled_docs(spark, sf_dir, factor).persist()
        n_docs = docs.count()

        t0 = time.time()
        dt = doc_term_freqs(docs)
        vocab = vocab_from_dt(dt)
        scored = dsir_scores(dt, vocab)
        n_scored = scored.count()
        # VERDICT r8 #4: the vocab frame is the registry's largest
        # AQE-broadcast build side (21 MB at sf0.1) and GROWS with the
        # corpus — record its size and whether AQE demotes the dt-join
        # broadcast at this factor (post-AQE executed plan)
        from tools.shuffle_gate import measure
        from tools.scale_probe_aqe import _join_counts

        n_vocab = vocab.count()
        dsir_mets = measure(scored)
        dsir_joins = _join_counts(scored)
        mean_micro = scored.agg(
            F.expr("CAST(sum(dsir_micro) DIV count(1) AS BIGINT)")
        ).collect()[0][0]
        dsir_wall = time.time() - t0

        t1 = time.time()
        top = textrank_over(docs).collect()
        tr_wall = time.time() - t1

        docs.unpersist()
        row = {
            "factor": factor,
            "n_docs": n_docs,
            "dsir_wall_s": round(dsir_wall, 2),
            "dsir_us_per_doc": round(dsir_wall / n_docs * 1e6, 1),
            "dsir_rows": n_scored,
            "dsir_mean_micro": int(mean_micro),
            "vocab_terms": n_vocab,
            "dsir_max_broadcast_mb": round(
                dsir_mets["max_broadcast_bytes"] / 1e6, 1
            ),
            "dsir_shuffle_mb": round(
                dsir_mets["shuffle_bytes_written"] / 1e6, 1
            ),
            "dsir_joins": dsir_joins,
            "textrank_wall_s": round(tr_wall, 2),
            "textrank_us_per_doc": round(tr_wall / n_docs * 1e6, 1),
            "textrank_top_terms": [r.term for r in top[:5]],
        }
        out.append(row)
        print(json.dumps(row))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
