"""Round-4 additions: raster decode query + UDTF chunking."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_raster_decode_rows_and_ranges(spark):
    fn, _ = REGISTRY["multimodal_raster_decode"]
    rows = fn(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        assert 8 <= r.width <= 16 and 6 <= r.height <= 12
        assert 0.0 <= r.mean_luma <= 255.0
        assert r.fmt in ("bmp", "ppm")


def test_doc_chunks_udtf_contract(spark):
    fn, _ = REGISTRY["doc_chunks_udtf"]
    out = fn(spark, SF)
    rows = out.collect()
    assert rows, "no chunks produced"
    # per-doc chunk ids are dense from 0; only the last chunk may be short
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in list(by_doc.items())[:50]:
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        counts = [c.n_chunk_tokens for c in chunks]
        assert all(1 <= c <= 64 for c in counts)
        # windows over one token list: counts are non-increasing, and once
        # below the window size they shrink by exactly the stride (16)
        assert counts == sorted(counts, reverse=True)
        for prev, nxt in zip(counts, counts[1:]):
            if prev < 64:
                assert nxt == prev - 16


def test_chunk_udtf_python_semantics():
    from shortvideohybridanalyticslakehouse_spark.functions.udtfs import (
        ChunkDocument,
    )

    inst = ChunkDocument.func()  # instantiate the underlying class
    toks = [f"t{i}" for i in range(40)]
    out = list(inst.eval(" ".join(toks), 16, 8))
    # stride 8: starts 0,8,16,24,32 -> 5 chunks; last has 8 tokens
    assert [c[0] for c in out] == [0, 1, 2, 3, 4]
    assert [c[2] for c in out] == [16, 16, 16, 16, 8]
    assert out[0][1].split() == toks[:16]
    assert list(inst.eval("", 16, 8)) == []
    assert list(inst.eval("   ", 16, 8)) == []
