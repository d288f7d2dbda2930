"""Color baseline JPEG (SOF0 YCbCr 4:2:0) — round 6 (VERDICT r5 #5).

The decoder must recover, from REAL interleaved entropy-coded bytes, the
closed form the DuckDB oracle replays: per-MCU Y/Cb/Cr DC constants +
planted AC deltas, replication chroma upsample, libjpeg fixed-point
YCbCr->RGB. These tests pin the closed form in Python; the registry
queries (queries_ext79) pin it cross-engine.
"""

from __future__ import annotations

import numpy as np
import pytest

from shortvideohybridanalyticslakehouse_spark.functions import multimodal


def _expected_rgb(d: int):
    """Closed-form decoded image for fixture doc d (mirrors the oracle)."""
    deltas = multimodal.jpeg_pattern_deltas()
    w, h = multimodal._jpeg_color_fixture_dims(d)
    mx = w // 16
    rgb = np.zeros((h, w, 3), dtype=np.int64)
    for mi in range((w // 16) * (h // 16)):
        mrow, mcol = divmod(mi, mx)
        cb8 = np.clip(
            64
            + (d * 7 + mi * 31) % 128
            + np.array(deltas[(d + mi) % 4]).reshape(8, 8),
            0,
            255,
        )
        cr8 = np.clip(
            64
            + (d * 11 + mi * 37) % 128
            + np.array(deltas[(d + mi + 2) % 4]).reshape(8, 8),
            0,
            255,
        )
        cb = np.repeat(np.repeat(cb8, 2, 0), 2, 1) - 128
        cr = np.repeat(np.repeat(cr8, 2, 0), 2, 1) - 128
        y = np.zeros((16, 16), dtype=np.int64)
        for j, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            yc = (d * 13 + mi * 41 + j * 29) % 256
            y[dy * 8 : dy * 8 + 8, dx * 8 : dx * 8 + 8] = np.clip(
                yc + np.array(deltas[(d + mi + j) % 4]).reshape(8, 8), 0, 255
            )
        r = y + (91881 * cr + 32768) // 65536
        g = y - (22554 * cb + 46802 * cr + 32768) // 65536
        b = y + (116130 * cb + 32768) // 65536
        rgb[mrow * 16 : mrow * 16 + 16, mcol * 16 : mcol * 16 + 16] = np.stack(
            [np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(b, 0, 255)], -1
        )
    return w, h, rgb


def test_color_fixture_round_trip_exact():
    """All six dimension combos, restart and non-restart docs, every
    planted pattern on Y AND both chroma planes."""
    for d in [0, 1, 2, 3, 4, 5, 6, 7, 11, 100, 255, 499]:
        w, h, want = _expected_rgb(d)
        dw, dh, got = multimodal.decode_jpeg_color(
            multimodal._jpeg_color_fixture_payload(d)
        )
        assert (dw, dh) == (w, h)
        assert np.array_equal(got.astype(np.int64), want), d


def test_color_chroma_bases_never_clamp():
    """The oracle's exactness needs chroma samples inside [0, 255] BEFORE
    the -128 shift; bases are chosen in [64, 191] and planted deltas are
    small — assert the slack so a future pattern change fails loudly."""
    deltas = np.array(multimodal.jpeg_pattern_deltas())
    assert abs(deltas).max() + 191 <= 255
    assert 64 - abs(deltas).max() >= 0


def test_color_restart_resets_all_three_predictors():
    """d=3k docs carry DRI=2: corrupting the RSTn cycle must be rejected,
    and removing the restart must desync the stream (predictors matter)."""
    p = multimodal._jpeg_color_fixture_payload(3)  # 16x32 -> 2 MCUs, DRI=1
    i = p.index(b"\xff\xd0")  # first RST0
    bad = bytearray(p)
    bad[i + 1] = 0xD1  # wrong cycle index
    with pytest.raises(ValueError, match="RST"):
        multimodal.decode_jpeg_color(bytes(bad))
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_color(p[:i] + p[i + 2 :])


def test_color_rejects_unsupported_variants():
    p = bytearray(multimodal._jpeg_color_fixture_payload(1))
    i = p.index(b"\xff\xc0")
    q = bytearray(p)
    q[i + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="baseline"):
        multimodal.decode_jpeg_color(bytes(q))
    # 4:4:4 (luma sampling 1x1) is a different subsampling contract
    q = bytearray(p)
    q[i + 11] = 0x11  # Y component sampling byte inside SOF0
    with pytest.raises(ValueError, match="4:2:0"):
        multimodal.decode_jpeg_color(bytes(q))
    with pytest.raises(ValueError, match="SOI"):
        multimodal.decode_jpeg_color(b"\x00\x01")
    # the color decoder refuses grayscale payloads (and vice versa the
    # gray decoder refuses 3-component ones)
    with pytest.raises(ValueError, match="3 components"):
        multimodal.decode_jpeg_color(multimodal._jpeg_fixture_payload(1))
    with pytest.raises(ValueError, match="single-component"):
        multimodal.decode_jpeg_gray(multimodal._jpeg_color_fixture_payload(1))


def test_color_decode_stats_spark(spark):
    docs = spark.createDataFrame([(d,) for d in [0, 3, 7]], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in multimodal.jpeg_color_decode_stats(
            multimodal.synthetic_jpeg_color_payloads(docs, "doc_id"),
            "doc_id",
        ).collect()
    }
    for d in [0, 3, 7]:
        w, h, rgb = _expected_rgb(d)
        r = rows[d]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_mcus"] == (w // 16) * (h // 16)
        assert r["sum_r"] == int(rgb[:, :, 0].sum())
        assert r["sum_g"] == int(rgb[:, :, 1].sum())
        assert r["sum_b"] == int(rgb[:, :, 2].sum())
        assert r["min_px"] == int(rgb.min())
        assert r["max_px"] == int(rgb.max())
