"""Streaming DSIR vocabulary as an incremental MV: the target/raw
unigram counts are a counting monoid, so the generic MV maintainer
(streaming/mv.py) keeps them live while documents arrive — and scoring
from the streamed vocabulary must equal the batch DSIR scores EXACTLY
(integer micro weights: no float drift to hide behind)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext120 import (
    doc_term_freqs,
    dsir_scores,
    vocab_from_dt,
)
from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    read_mv,
    start_mv_job,
    summing,
)

_SCHEMA = "doc_id long, text string, lang string, source string"

_WORDS_EN = ["alpha", "beta", "gamma", "delta"]
_WORDS_XX = ["omega", "psi", "chi", "rho"]


def _rows():
    rows = []
    for i in range(60):
        en = i % 3 != 0
        words = _WORDS_EN if en else _WORDS_XX
        text = " ".join(words[(i + k) % 4] for k in range(5 + i % 7))
        rows.append((i, text, "en" if en else "de", f"s{i % 4}"))
    return rows


def _spec():
    return MvSpec(
        key_cols=("term",),
        measures=(
            summing(F.col("tf"), "cnt_raw"),
            summing(F.col("tgt_tf"), "cnt_tgt"),
        ),
    )


def test_streamed_vocab_reproduces_batch_dsir(spark, tmp_path):
    rows = _rows()
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t0 = time.time() - 600
    per = 20
    for i in range(3):
        p = os.path.join(src, f"f{i:04d}.json")
        with open(p, "w") as f:
            for d, text, lang, source in rows[i * per : (i + 1) * per]:
                f.write(
                    '{"doc_id": %d, "text": "%s", "lang": "%s", '
                    '"source": "%s"}\n' % (d, text, lang, source)
                )
        os.utime(p, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    # tokenize inside the streaming query: per-(doc, term) tf rows with
    # the target-slice tf alongside — the MV's input measures
    dt_stream = doc_term_freqs(stream).withColumn(
        "tgt_tf",
        F.when(F.col("lang") == "en", F.col("tf")).otherwise(F.lit(0)),
    )
    store = os.path.join(str(tmp_path), "vocab_mv")
    q = start_mv_job(
        spark,
        dt_stream,
        store,
        os.path.join(str(tmp_path), "ckpt"),
        _spec(),
    )
    q.awaitTermination(120)

    streamed_vocab = read_mv(spark, store, _spec()).select(
        "term", "cnt_raw", "cnt_tgt"
    )

    batch_docs = spark.createDataFrame(rows, _SCHEMA)
    dt = doc_term_freqs(batch_docs)
    batch_vocab = vocab_from_dt(dt)

    # 1) the streamed vocabulary IS the batch vocabulary
    assert sorted(map(tuple, streamed_vocab.collect())) == sorted(
        map(tuple, batch_vocab.collect())
    )

    # 2) scoring every document from the streamed store equals the
    # batch DSIR scores bit-for-bit
    got = {
        r.doc_id: r.dsir_micro
        for r in dsir_scores(dt, streamed_vocab).collect()
    }
    exp = {
        r.doc_id: r.dsir_micro for r in dsir_scores(dt, batch_vocab).collect()
    }
    assert got == exp
    # and the scores separate target-like from unlike docs
    en_scores = [got[i] for i in got if i % 3 != 0]
    xx_scores = [got[i] for i in got if i % 3 == 0]
    assert min(en_scores) > max(xx_scores)
