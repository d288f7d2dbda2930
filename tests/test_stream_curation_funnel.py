"""Incremental curation funnel: stream==batch equality on a closed set +
per-stage attrition counters via observedMetrics.

Fixture discipline: one file per document with PINNED ascending mtimes
(FileStreamSource orders by modification time, not name) so stream
arrival order == doc_id order and first-arrival exact-dedup coincides
with the batch min-doc_id rule. A far-future sentinel document arrives
last to push the watermark past every real window (append-mode
aggregations hold verdicts until the watermark passes); the sentinel
itself stays in state and is excluded from the comparison.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming import funnel


def _tokens(idx: list[int]) -> str:
    """Quality-passing token stream: distinct 4/5-char tokens (mean word
    length 4.5, TTR 1.0, top fraction 1/len)."""
    toks = []
    for i in idx:
        toks.append(f"a{i:03d}")
        toks.append(f"b{i:04d}")
    return " ".join(toks)


CORPUS_TEXT = _tokens(list(range(100, 112)))  # 24 tokens
# near-dup of the corpus doc: last token changed
NEAR_DUP_TEXT = CORPUS_TEXT.rsplit(" ", 1)[0] + " zzzzz"
HOLDOUT_TEXT = _tokens(list(range(200, 212)))
# contaminated: embeds an 8-token run from the holdout doc
CONTAM_TEXT = (
    _tokens(list(range(300, 304)))
    + " "
    + " ".join(HOLDOUT_TEXT.split(" ")[4:12])
    + " "
    + _tokens(list(range(310, 314)))
)

CLEAN_1 = _tokens(list(range(400, 412)))
CLEAN_2 = _tokens(list(range(500, 512)))
SENTINEL = _tokens(list(range(600, 612)))

T0 = "2024-01-01 10:00:"
DOCS = [
    {"doc_id": 1, "lang": "en", "text": CLEAN_1, "ingest_ts": T0 + "01"},
    {"doc_id": 2, "lang": "fr", "text": CLEAN_2, "ingest_ts": T0 + "02"},
    {"doc_id": 3, "lang": "en", "text": "too short", "ingest_ts": T0 + "03"},
    {"doc_id": 4, "lang": "en", "text": CLEAN_1, "ingest_ts": T0 + "04"},
    {"doc_id": 5, "lang": "en", "text": NEAR_DUP_TEXT, "ingest_ts": T0 + "05"},
    {"doc_id": 6, "lang": "en", "text": CONTAM_TEXT, "ingest_ts": T0 + "06"},
    {"doc_id": 7, "lang": "en", "text": CLEAN_2, "ingest_ts": T0 + "07"},
    {
        "doc_id": 999,
        "lang": "en",
        "text": SENTINEL,
        "ingest_ts": "2024-01-01 13:00:00",
    },
]

SCHEMA = "doc_id long, lang string, text string, ingest_ts timestamp"


def _batch_docs(spark):
    raw = spark.createDataFrame(
        [tuple(d.values()) for d in DOCS],
        "doc_id long, lang string, text string, ingest_ts string",
    )
    return raw.withColumn("ingest_ts", F.to_timestamp("ingest_ts"))


def _statics(spark):
    corpus = spark.createDataFrame(
        [(900, CORPUS_TEXT)], "doc_id long, text string"
    )
    holdout = spark.createDataFrame(
        [(950, HOLDOUT_TEXT)], "doc_id long, text string"
    )
    return funnel.build_curation_probe_table(corpus, holdout)


def _write_stream_fixture(src: str) -> None:
    os.makedirs(src)
    for n, row in enumerate(DOCS):
        path = os.path.join(src, f"d{n:02d}.json")
        with open(path, "w") as f:
            f.write(json.dumps(row))
        mtime = 1_700_000_000 + 10 * n  # strictly increasing
        os.utime(path, (mtime, mtime))


def test_probe_table_schema(spark):
    pt = _statics(spark)
    assert pt.columns == ["ptype", "pkey", "corpus_id", "sig_corpus", "_probe_hit"]
    kinds = {r["ptype"] for r in pt.select("ptype").distinct().collect()}
    assert kinds == {"band", "gram"}
    # _probe_hit is never null on the static side (the left-join marker)
    assert pt.filter(F.col("_probe_hit").isNull()).count() == 0


def test_batch_funnel_verdicts(spark):
    pt = _statics(spark)
    out = funnel.ingest_curation_plan(_batch_docs(spark), pt)
    got = {r["doc_id"]: r for r in out.collect()}
    # survivors: clean docs + sentinel (batch has no watermark holdback);
    # 2 language, 3 quality, 4 exact-dup, 5 near-dup, 6 contaminated drop
    assert set(got) == {1, 7, 999}
    assert all(r["corpus_agreement"] < 0.5 for r in got.values())


def test_stream_matches_batch_and_counts_attrition(spark, tmp_path):
    pt = _statics(spark)
    src = os.path.join(str(tmp_path), "in")
    _write_stream_fixture(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 3)
        .json(src)
    )
    out = funnel.ingest_curation_plan(stream, pt)
    q = (
        out.writeStream.format("memory")
        .queryName("curation_funnel")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_rows = {
        r["doc_id"]: r for r in spark.sql("select * from curation_funnel").collect()
    }

    # stream survivors == batch survivors minus the sentinel (held back by
    # the watermark, by design)
    batch_rows = {
        r["doc_id"]: r
        for r in funnel.ingest_curation_plan(_batch_docs(spark), pt).collect()
        if r["doc_id"] != 999
    }
    assert set(stream_rows) == set(batch_rows) == {1, 7}
    for d, br in batch_rows.items():
        sr = stream_rows[d]
        assert (sr["fp"], sr["n_tok"], sr["corpus_agreement"]) == (
            br["fp"],
            br["n_tok"],
            br["corpus_agreement"],
        )

    # attrition counters, summed across micro-batches
    totals: dict[str, int] = {}
    for p in q.recentProgress:
        for name, metrics in (p["observedMetrics"] or {}).items():
            for k, v in metrics.asDict().items():
                totals[f"{name}.{k}"] = totals.get(f"{name}.{k}", 0) + int(v)
    assert totals["funnel_raw.n_docs"] == 8
    assert totals["funnel_language.n_docs"] == 7
    assert totals["funnel_quality.n_docs"] == 6
    assert totals["funnel_exact.n_docs"] == 5
    assert totals["funnel_decision.docs_decided"] == 4  # sentinel held
    assert totals["funnel_decision.near_dup_dropped"] == 1
    assert totals["funnel_decision.contaminated_dropped"] == 1
    assert totals["funnel_decision.survivors"] == 2


def test_funnel_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill the funnel stream mid-ingest and restart from the same
    checkpoint with a durable (parquet) sink: the final survivor set must
    equal the batch twin exactly once — recovered dedup/agg state must
    not re-admit an exact duplicate whose first occurrence was processed
    before the kill, and the file-sink commit log must not double-write."""
    import time as _time

    clean_text_0 = _tokens(list(range(1000, 1012)))
    docs = [
        {"doc_id": 1000, "lang": "en", "text": clean_text_0},
        # dup processed BEFORE the kill (arrives right after the original)
        {"doc_id": 2000, "lang": "en", "text": clean_text_0},
    ]
    for i in range(1, 24):  # clean docs, distinct vocab per doc
        docs.append(
            {
                "doc_id": 1000 + i,
                "lang": "en",
                "text": _tokens(list(range(1000 + 20 * i, 1012 + 20 * i))),
            }
        )
        if i == 20:
            # dup processed AFTER the restart, while the original's fp key
            # (first file, pre-kill) is still inside the 10-min dedup
            # horizon — the recovered state must reject it
            docs.append({"doc_id": 2001, "lang": "en", "text": clean_text_0})
    docs.append({"doc_id": 3000, "lang": "en", "text": NEAR_DUP_TEXT})
    docs.append({"doc_id": 3001, "lang": "en", "text": CONTAM_TEXT})
    docs.append({"doc_id": 3002, "lang": "fr", "text": CLEAN_2})
    # tight 5-second spacing keeps every event inside the dedup watermark
    # horizon (total span ~2.5 min << 10 min delay); the sentinel alone
    # advances the watermark past the verdict windows
    for k, row in enumerate(docs):
        row["ingest_ts"] = f"2024-01-01 10:{(5 * k) // 60:02d}:{(5 * k) % 60:02d}"
    docs.append(
        {"doc_id": 9999, "lang": "en", "text": SENTINEL,
         "ingest_ts": "2024-01-01 14:00:00"}
    )

    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    base = 1_700_000_000
    for k, row in enumerate(docs):
        fp = os.path.join(src, f"d{k:03d}.json")
        with open(fp, "w") as f:
            f.write(json.dumps(row))
        os.utime(fp, (base + 10 * k, base + 10 * k))

    pt = _statics(spark)
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def start(trigger_kwargs):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        return (
            funnel.ingest_curation_plan(stream, pt)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q = start({"processingTime": "0 seconds"})
    deadline = _time.time() + 120
    while _time.time() < deadline:
        lp = q.lastProgress
        if lp and int(lp["batchId"]) >= 5:
            break
        _time.sleep(0.5)
    assert q.lastProgress and int(q.lastProgress["batchId"]) >= 5
    q.stop()  # mid-stream kill: most files (incl. sentinel) unprocessed

    q2 = start({"availableNow": True})
    q2.awaitTermination(180)

    got = {
        r["doc_id"]: r for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: r
        for r in funnel.ingest_curation_plan(
            spark.createDataFrame(
                [tuple(d.values()) for d in docs],
                "doc_id long, lang string, text string, ingest_ts string",
            ).withColumn("ingest_ts", F.to_timestamp("ingest_ts")),
            pt,
        ).collect()
        if r["doc_id"] != 9999  # sentinel held by the watermark on the stream
    }
    # survivors: 24 clean docs exactly once (dups/near-dup/contam/fr dropped)
    assert set(got) == set(batch) == {1000 + i for i in range(24)}
    for d, br in batch.items():
        assert (got[d]["fp"], got[d]["n_tok"]) == (br["fp"], br["n_tok"])


def test_bucketed_probe_table_elides_static_side_shuffle(spark, tmp_path):
    """The 100 TB co-location path: writing the probe table bucketed on
    the join keys (ptype, pkey) lets the funnel's screening join consume
    the bucketed scan's partitioning directly — NO Exchange on the
    static side (only an in-partition Sort), and results identical to
    the unbucketed plan. At scale this deletes the per-micro-batch
    reshuffle of the whole corpus index."""
    pt = _statics(spark)
    table = "curation_probe_bkt_test"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            pt.write.mode("overwrite")
            .format("parquet")
            .bucketBy(4, "ptype", "pkey")
            .sortBy("ptype", "pkey")
            .saveAsTable(table)
        )
        bucketed = spark.table(table)
        out = funnel.ingest_curation_plan(_batch_docs(spark), bucketed)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan  # bucketed scan actually used
        # the node DIRECTLY above the bucketed scan must be the join's
        # in-partition Sort, not an Exchange (shuffle elided on the
        # static side; the stream side still co-partitions, correctly)
        lines = plan.split("\n")
        idx = next(i for i, line in enumerate(lines) if table in line)
        # immediate ancestor chain above the scan (Filter -> Sort -> join):
        # must reach a Sort with NO Exchange in between
        chain = lines[max(0, idx - 3) : idx]
        assert any("Sort [" in line for line in chain), chain
        assert not any("Exchange" in line for line in chain), chain
        # and the whole bucketed plan carries strictly fewer shuffles
        # than the unbucketed twin
        def real_exchanges(p: str) -> int:
            return p.count("Exchange") - p.count("ReusedExchange")

        plain_plan = (
            funnel.ingest_curation_plan(_batch_docs(spark), pt)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert real_exchanges(plan) < real_exchanges(plain_plan)
        # value parity with the unbucketed path
        expect = {
            (r["doc_id"], r["fp"], r["n_tok"], r["corpus_agreement"])
            for r in funnel.ingest_curation_plan(_batch_docs(spark), pt).collect()
        }
        got = {
            (r["doc_id"], r["fp"], r["n_tok"], r["corpus_agreement"])
            for r in out.collect()
        }
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
