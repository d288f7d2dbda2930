"""Multimodal binary-column plumbing tests: schema, Arrow batching,
deterministic stub decode, frame-sample explode grain."""

from __future__ import annotations

import hashlib

from shortvideohybridanalyticslakehouse_spark.functions import multimodal


def fixture(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 3000), (3, "xyz")],
        "doc_id long, text string",
    )


def test_attach_binary_schema(spark):
    df = multimodal.attach_binary_payload(fixture(spark))
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media"].startswith("struct<media_type:string,width:int")


def test_decode_stats_deterministic(spark):
    df = multimodal.attach_binary_payload(fixture(spark))
    out = {r.doc_id: r for r in multimodal.decode_stats(df).collect()}
    assert out[1].n_bytes == 11
    assert out[1].sha256 == hashlib.sha256(b"hello world").hexdigest()
    h = hashlib.sha256(b"hello world").digest()
    assert out[1].fake_width == 64 + h[0] % 192
    assert out[1].fake_height == 64 + h[1] % 192
    # repartitioned input produces identical results (batch-shape independent)
    out2 = {
        r.doc_id: r
        for r in multimodal.decode_stats(df.repartition(3)).collect()
    }
    assert {k: (v.n_bytes, v.sha256) for k, v in out.items()} == {
        k: (v.n_bytes, v.sha256) for k, v in out2.items()
    }


def test_frame_sample_grain(spark):
    df = multimodal.attach_binary_payload(fixture(spark))
    frames = multimodal.frame_sample(df, every_ms=1000).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_offset_ms)
    assert per_doc[1] == [0]          # 11 "ms" -> one frame
    assert per_doc[2] == [0, 1000, 2000]  # 3000 "ms" -> three frames
    assert len({r.frame_checksum for r in frames}) == len(frames)


def test_resize_schema_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another payload")], "doc_id long, text string"
    )
    out = multimodal.resize(
        multimodal.attach_binary_payload(docs), target_width=128, target_height=96
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        # stub payload is a sha256 digest; metadata carries the target dims
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) == 32
        assert r.media.width == 128 and r.media.height == 96
        assert r.media.media_type == "image/fake"
    # deterministic: same input -> same surrogate payload
    again = {r.doc_id: r.payload for r in out.collect()}
    assert {k: v.payload for k, v in rows.items()} == again
