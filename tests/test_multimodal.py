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


# ---------------------------------------------------------------------------
# Real raster codec (round 4): BMP/PPM parse, luma features, fallbacks
# ---------------------------------------------------------------------------


def test_raster_round_trip_both_formats():
    import numpy as np

    for d in (0, 1, 2, 3, 10, 17, 33):  # covers BMP stride-pad widths 8..16
        w, h = 8 + d % 9, 6 + d % 7
        rgb = ((d * 31 + np.arange(3 * w * h)) % 256).astype(np.uint8).tobytes()
        for enc, name in ((multimodal.encode_ppm, "ppm"), (multimodal.encode_bmp, "bmp")):
            fmt, w2, h2, px = multimodal.decode_raster(enc(w, h, rgb))
            assert fmt == name and (w2, h2) == (w, h)
            assert px.tobytes() == rgb  # stride pad, row order, BGR all undone


def test_raster_rejects_malformed():
    import pytest as _pytest

    for bad in (b"", b"GIF89a....", b"P6\n8 6\n255\n" + b"\x00" * 10,
                b"BM" + b"\x00" * 20):
        with _pytest.raises(ValueError):
            multimodal.decode_raster(bad)


def test_decode_image_real_vs_fake_fallback():
    import numpy as np

    rgb = (np.arange(3 * 8 * 6) % 256).astype(np.uint8).tobytes()
    assert multimodal._decode_image(multimodal.encode_ppm(8, 6, rgb)) == (8, 6)
    assert multimodal._decode_image(multimodal.encode_bmp(8, 6, rgb)) == (8, 6)
    # non-raster payload -> deterministic hash-derived fake dims (plumbing path)
    w, h = multimodal._decode_image(b"not an image")
    assert 64 <= w < 256 and 64 <= h < 256
    assert (w, h) == multimodal._decode_image(b"not an image")


def test_raster_decode_stats_spark(spark):
    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    payloads = multimodal.synthetic_raster_payloads(ids, "doc_id")
    out = {r.doc_id: r for r in multimodal.raster_decode_stats(payloads).collect()}
    assert set(out) == set(range(12))
    for d, r in out.items():
        assert r.fmt == ("bmp" if d % 2 else "ppm")
        assert (r.width, r.height) == (8 + d % 9, 6 + d % 7)
        tot = sum(
            299 * ((d * 31 + 3 * i) % 256)
            + 587 * ((d * 31 + 3 * i + 1) % 256)
            + 114 * ((d * 31 + 3 * i + 2) % 256)
            for i in range(r.width * r.height)
        )
        assert r.mean_luma == round(tot / (1000.0 * r.width * r.height), 6)


def test_raster_round_trip_property():
    """Property: decode(encode(w, h, rgb)) == (w, h, rgb) for BOTH formats
    over arbitrary dims (BMP stride padding varies with w % 4) and pixels."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        fmt=st.sampled_from(["bmp", "ppm"]),
    )
    def check(w, h, seed, fmt):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
        enc = multimodal.encode_bmp if fmt == "bmp" else multimodal.encode_ppm
        got_fmt, w2, h2, px = multimodal.decode_raster(enc(w, h, rgb))
        assert (got_fmt, w2, h2) == (fmt, w, h)
        assert px.tobytes() == rgb

    check()


def test_ppm_header_with_comments():
    import numpy as np

    rgb = (np.arange(3 * 4 * 2) % 256).astype(np.uint8).tobytes()
    payload = b"P6\n# a comment line\n4 2\n# another\n255\n" + rgb
    fmt, w, h, px = multimodal.decode_raster(payload)
    assert (fmt, w, h) == ("ppm", 4, 2) and px.tobytes() == rgb


# ---------------------------------------------------------------------------
# Audio lane: RIFF/WAVE 16-bit PCM
# ---------------------------------------------------------------------------


def test_wav_round_trip_planted_square_wave():
    """Planted waveform with analytically known features: a +/-1000 square
    wave at 8 kHz mono. Every stat is hand-computable: peak 1000, mean
    |s| 1000, rms exactly 1000 => rms_micro exactly 1e9."""
    import numpy as np

    samples = np.tile([1000, -1000], 400).astype(np.int16)
    wav = multimodal.encode_wav(8000, 1, samples)
    rate, ch, frames = multimodal.decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert frames.shape == (800, 1)
    assert np.array_equal(frames.ravel(), samples)
    s = multimodal.wav_stats(rate, ch, frames)
    assert s == {
        "channels": 1,
        "sample_rate": 8000,
        "n_frames": 800,
        "duration_ms": 100,
        "peak_abs": 1000,
        "sum_abs": 800 * 1000,
        "rms_micro": 1000 * 1_000_000,
    }


def test_wav_round_trip_property():
    """Property: decode(encode(rate, ch, samples)) restores every sample
    bit-exactly for arbitrary rates, channel counts, and int16 values
    (including the -32768 edge and odd total-byte-length payloads)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 44100]),
        ch=st.integers(min_value=1, max_value=4),
        n=st.integers(min_value=1, max_value=500),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(rate, ch, n, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=n * ch, dtype=np.int64).astype(
            np.int16
        )
        rate2, ch2, frames = multimodal.decode_wav(
            multimodal.encode_wav(rate, ch, samples)
        )
        assert (rate2, ch2) == (rate, ch)
        assert frames.shape == (n, ch)
        assert np.array_equal(frames.ravel(), samples)

    check()


def test_wav_chunk_walk_skips_metadata_and_pad():
    """A LIST/INFO chunk with an ODD declared size spliced before fmt/data
    must be skipped via the word-alignment pad — the layout the fixture
    generator plants on every third id."""
    import numpy as np

    samples = np.arange(-5, 5, dtype=np.int16)
    wav = multimodal.encode_wav(12000, 2, samples)
    info = b"INFOICMT" + (7).to_bytes(4, "little") + b"fixture"
    lst = b"LIST" + len(info).to_bytes(4, "little") + info + b"\x00"
    body = wav[12:]
    spliced = (
        b"RIFF" + (4 + len(lst) + len(body)).to_bytes(4, "little") + b"WAVE"
        + lst + body
    )
    rate, ch, frames = multimodal.decode_wav(spliced)
    assert (rate, ch) == (12000, 2)
    assert np.array_equal(frames.ravel(), samples)


def test_wav_rejects_malformed():
    import numpy as np
    import pytest

    ok = multimodal.encode_wav(8000, 1, np.arange(4, dtype=np.int16))
    for bad in [
        b"",
        b"RIFFxxxx",                     # too short / no WAVE form
        b"RIFX" + ok[4:],                # wrong magic
        ok[:4] + ok[4:8] + b"AVI " + ok[12:],  # wrong form type
        ok[:-3],                         # truncated data chunk
    ]:
        with pytest.raises(ValueError):
            multimodal.decode_wav(bad)
    # non-PCM format code rejected: patch audio_format=3 (IEEE float)
    bad_fmt = bytearray(ok)
    fmt_off = ok.index(b"fmt ") + 8
    bad_fmt[fmt_off:fmt_off + 2] = (3).to_bytes(2, "little")
    with pytest.raises(ValueError):
        multimodal.decode_wav(bytes(bad_fmt))


def test_wav_decode_stats_spark(spark):
    """End-to-end through mapInPandas: synthetic fixtures -> decode ->
    stats equal a pure-Python replay of the closed form."""
    import math

    df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    payloads = multimodal.synthetic_wav_payloads(df, "doc_id")
    got = {
        r["doc_id"]: r.asDict()
        for r in multimodal.wav_decode_stats(payloads, "doc_id").collect()
    }
    assert len(got) == 24
    for d in range(24):
        ch = 1 + d % 2
        rate = 8000 + (d % 3) * 4000
        n_frames = 400 + d % 241
        vals = [((d * 37 + i * 13) % 4001) - 2000 for i in range(n_frames * ch)]
        sum_sq = sum(v * v for v in vals)
        expect = {
            "doc_id": d,
            "channels": ch,
            "sample_rate": rate,
            "n_frames": n_frames,
            "duration_ms": (n_frames * 1000) // rate,
            "peak_abs": max(abs(v) for v in vals),
            "sum_abs": sum(abs(v) for v in vals),
            "rms_micro": math.floor(
                math.sqrt(sum_sq / len(vals)) * 1_000_000
            ),
        }
        assert got[d] == expect, f"doc {d}"


# ---------------------------------------------------------------------------
# Video lane: RIFF/AVI uncompressed DIB frames
# ---------------------------------------------------------------------------


def test_avi_round_trip_planted_frames():
    """Planted clip: decode(encode(...)) restores geometry, timing, and
    every pixel of every frame bit-exactly (stride padding exercised by
    the odd width)."""
    import numpy as np

    w, h, fps = 5, 3, 25  # w=5 -> row_bytes 15 -> stride pad 1
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=3 * w * h, dtype=np.int64)
        .astype(np.uint8)
        .tobytes()
        for _ in range(4)
    ]
    w2, h2, uspf, decoded = multimodal.decode_avi(
        multimodal.encode_avi(w, h, fps, frames)
    )
    assert (w2, h2, uspf) == (w, h, 1_000_000 // fps)
    assert decoded.shape == (4, h, w, 3)
    for f, rgb in enumerate(frames):
        assert decoded[f].tobytes() == rgb


def test_avi_rejects_malformed():
    import numpy as np
    import pytest

    frames = [(np.arange(36) % 256).astype(np.uint8).tobytes()]
    ok = multimodal.encode_avi(4, 3, 10, frames)
    for bad in [b"", b"RIFF\x04\x00\x00\x00WAVE", ok[:40]]:
        with pytest.raises(ValueError):
            multimodal.decode_avi(bad)


def test_avi_frame_sample_spark(spark):
    """End-to-end: synthetic AVI fixtures -> decode -> every-2nd-frame
    rows equal a pure-Python replay of the closed form."""
    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    payloads = multimodal.synthetic_avi_payloads(df, "doc_id")
    got = {
        (r["doc_id"], r["frame_id"]): r.asDict()
        for r in multimodal.avi_frame_sample(payloads, every=2).collect()
    }
    n_expected = 0
    for d in range(12):
        w, h = 6 + d % 5, 4 + d % 4
        fps = 10 + d % 3
        n_frames = 2 + d % 3
        for f in range(0, n_frames, 2):
            n_expected += 1
            row = got[(d, f)]
            tot = sum(
                299 * ((d * 31 + f * 97 + 3 * i) % 256)
                + 587 * ((d * 31 + f * 97 + 3 * i + 1) % 256)
                + 114 * ((d * 31 + f * 97 + 3 * i + 2) % 256)
                for i in range(w * h)
            )
            assert row["width"] == w and row["height"] == h
            assert row["frame_offset_ms"] == (f * (1_000_000 // fps)) // 1000
            assert row["mean_luma"] == round(tot / (1000.0 * w * h), 6)
    assert len(got) == n_expected


def test_wav_autocorr_constant_signal():
    """Constant signal: ac_lag1 == sum over the (n-ch) overlapped products
    == (n-ch)*c^2, sum_sq == n*c^2 — ratio is exactly (n-ch)/n."""
    import math

    import numpy as np

    c, n = 700, 50
    samples = np.full(n, c, dtype=np.int16)
    wav = multimodal.encode_wav(8000, 1, samples)
    rate, ch, frames = multimodal.decode_wav(wav)
    s = frames.astype(np.int64).ravel()
    ac = int((s[:-1] * s[1:]).sum())
    assert ac == (n - 1) * c * c
    assert int((s * s).sum()) == n * c * c
    assert math.floor(ac / (n * c * c) * 1_000_000) == math.floor(
        (n - 1) / n * 1_000_000
    )


def test_resize_raster_round_trip_exact():
    """Resize to the SAME dims must be the identity (floor mapping hits
    every source index exactly once when dims match), and format is
    preserved per payload."""
    import numpy as np

    rgb = (np.arange(3 * 8 * 6) % 256).astype(np.uint8).tobytes()
    for enc, fmt in ((multimodal.encode_bmp, "bmp"), (multimodal.encode_ppm, "ppm")):
        payload = enc(8, 6, rgb)
        _, w, h, src = multimodal.decode_raster(payload)
        sx = (np.arange(8, dtype=np.int64) * w) // 8
        sy = (np.arange(6, dtype=np.int64) * h) // 6
        assert src[sy][:, sx].tobytes() == rgb


def test_resize_raster_spark_known_mapping(spark):
    """2x upscale of a 2x2 image: every destination pixel must equal the
    floor-mapped source pixel."""
    import numpy as np

    src = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    payload = multimodal.encode_ppm(2, 2, src.tobytes())
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = multimodal.resize_raster(df, 4, 4, "doc_id").collect()[0]
    fmt, w, h, px = multimodal.decode_raster(bytes(out["payload"]))
    assert (fmt, w, h) == ("ppm", 4, 4)
    for y in range(4):
        for x in range(4):
            assert (px[y, x] == src[(y * 2) // 4, (x * 2) // 4]).all()
    assert out["media"]["width"] == 4 and out["media"]["media_type"] == "image/ppm"


def test_codec_fuzz_never_crashes():
    """All three decoders must either decode or raise ValueError on
    arbitrary byte strings AND on truncations/corruptions of valid
    payloads — no hangs, no foreign exceptions. (IndexError is tolerated
    only for raster, whose documented fallback contract catches it.)"""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    rgb = (np.arange(3 * 6 * 4) % 256).astype(np.uint8).tobytes()
    valid = [
        multimodal.encode_bmp(6, 4, rgb),
        multimodal.encode_ppm(6, 4, rgb),
        multimodal.encode_wav(8000, 2, np.arange(-8, 8, dtype=np.int16)),
        multimodal.encode_avi(4, 3, 10, [(np.arange(36) % 256).astype(np.uint8).tobytes()]),
        multimodal.encode_png(6, 4, rgb),
        multimodal.encode_gif(6, 4, bytes(24), bytes(768)),
        multimodal._jpeg_fixture_payload(3),
        multimodal._jpeg_color_fixture_payload(3),
    ]

    @settings(max_examples=120, deadline=None)
    @given(
        base=st.integers(min_value=0, max_value=len(valid)),  # len(valid) => pure random
        cut=st.integers(min_value=0, max_value=200),
        flip_pos=st.integers(min_value=0, max_value=10_000),
        flip_val=st.integers(min_value=0, max_value=255),
        raw=st.binary(max_size=120),
    )
    def check(base, cut, flip_pos, flip_val, raw):
        if base < len(valid):
            b = bytearray(valid[base])
            if flip_pos < len(b):
                b[flip_pos] = flip_val
            payload = bytes(b[: max(0, len(b) - cut)])
        else:
            payload = raw
        for decoder, extra in (
            (multimodal.decode_raster, (IndexError,)),
            (multimodal.decode_wav, ()),
            (multimodal.decode_avi, ()),
            (multimodal.decode_png, ()),
            (multimodal.decode_gif, ()),
            (multimodal.decode_jpeg_gray, ()),
            (multimodal.decode_jpeg_color, ()),
        ):
            try:
                decoder(payload)
            except (ValueError, *extra):
                pass

    check()


# ---------------------------------------------------------------------------
# PNG lane: real DEFLATE + scanline filters
# ---------------------------------------------------------------------------


def test_png_round_trip_all_filters():
    """The encoder cycles filters row % 5, so any image with >=5 rows
    exercises None/Sub/Up/Average/Paeth; decode must be bit-exact."""
    import numpy as np

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (3, 7), (16, 12), (5, 5)]:
        rgb = rng.integers(0, 256, size=3 * w * h, dtype=np.int64).astype(
            np.uint8
        ).tobytes()
        w2, h2, px = multimodal.decode_png(multimodal.encode_png(w, h, rgb))
        assert (w2, h2) == (w, h)
        assert px.tobytes() == rgb


def test_png_round_trip_property():
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=15),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=3 * w * h, dtype=np.int64).astype(
            np.uint8
        ).tobytes()
        w2, h2, px = multimodal.decode_png(multimodal.encode_png(w, h, rgb))
        assert (w2, h2, px.tobytes()) == (w, h, rgb)

    check()


def test_png_rejects_crc_corruption_and_variants():
    import numpy as np
    import pytest

    rgb = (np.arange(3 * 4 * 6) % 256).astype(np.uint8).tobytes()
    ok = multimodal.encode_png(4, 6, rgb)
    # flip one byte INSIDE the IDAT data: CRC check must catch it
    idat_off = ok.index(b"IDAT") + 6
    bad = bytearray(ok)
    bad[idat_off] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(bad))
    # unsupported variant: patch IHDR color type to palette (3) and
    # re-sign the chunk CRC so the VARIANT check (not the CRC) rejects it
    import zlib

    bad2 = bytearray(ok)
    ihdr_type = ok.index(b"IHDR")
    bad2[ihdr_type + 4 + 9] = 3
    new_crc = zlib.crc32(bytes(bad2[ihdr_type : ihdr_type + 4 + 13])) & 0xFFFFFFFF
    bad2[ihdr_type + 17 : ihdr_type + 21] = new_crc.to_bytes(4, "big")
    with pytest.raises(ValueError, match="unsupported PNG"):
        multimodal.decode_png(bytes(bad2))
    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\n")  # no chunks
    with pytest.raises(ValueError):
        multimodal.decode_png(ok[:-8])  # truncated (no IEND)


# ---------------------------------------------------------------------------
# GIF lane: real variable-width LZW
# ---------------------------------------------------------------------------


def test_lzw_round_trip_regimes():
    """Width growth (random >256 entries), deep dictionary chains
    (constant/periodic data, KwKwK), and the 4096-entry reset (large
    random input) must all round-trip bit-exactly."""
    import numpy as np

    from shortvideohybridanalyticslakehouse_spark.functions.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    rng = np.random.default_rng(9)
    cases = [
        b"",
        b"\x00",
        b"abcabcabcabc" * 50,
        bytes(10_000),
        (b"\x01\x02" * 7000),
        rng.integers(0, 256, size=1500, dtype=np.int64).astype(np.uint8).tobytes(),
        rng.integers(0, 256, size=12_000, dtype=np.int64).astype(np.uint8).tobytes(),
    ]
    for c in cases:
        assert _lzw_decompress(_lzw_compress(c)) == c


def test_lzw_round_trip_property():
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from shortvideohybridanalyticslakehouse_spark.functions.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=6000),
        alphabet=st.integers(min_value=1, max_value=256),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, alphabet, seed):
        rng = np.random.default_rng(seed)
        data = rng.integers(0, alphabet, size=n, dtype=np.int64).astype(
            np.uint8
        ).tobytes()
        assert _lzw_decompress(_lzw_compress(data)) == data

    check()


def test_gif_round_trip_with_extension_block():
    import numpy as np

    w, h = 10, 8
    pal = ((np.arange(768) * 3) % 256).astype(np.uint8).tobytes()
    idx = ((np.arange(w * h) * 7) % 256).astype(np.uint8).tobytes()
    gif = multimodal.encode_gif(w, h, idx, pal)
    # splice a comment extension: the decoder must skip its sub-blocks
    head_end = 13 + 768
    ext = b"\x21\xfe\x05hello\x00"
    spliced = gif[:head_end] + ext + gif[head_end:]
    pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    expect = pal_arr[np.frombuffer(idx, dtype=np.uint8)].reshape(h, w, 3)
    for payload in (gif, spliced):
        w2, h2, rgb = multimodal.decode_gif(payload)
        assert (w2, h2) == (w, h) and (rgb == expect).all()


def test_gif_rejects_malformed():
    import numpy as np
    import pytest

    pal = bytes(768)
    ok = multimodal.encode_gif(4, 3, bytes(12), pal)
    for bad in [b"", b"GIF89a", ok[:-1][: len(ok) - 30], b"NOTGIF" + ok[6:]]:
        with pytest.raises(ValueError):
            multimodal.decode_gif(bad)
    # interlace flag set -> explicit unsupported-variant error
    bad2 = bytearray(ok)
    desc = ok.index(b"\x2c", 13 + 768)
    bad2[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_gif(bytes(bad2))


# ---------------------------------------------------------------------------
# JPEG lane: real baseline DCT codec (Huffman entropy + IDCT)
# ---------------------------------------------------------------------------


def test_jpeg_fixture_round_trip_exact():
    """Every fixture decodes to EXACTLY clamp(c + delta[pat][i]) per
    block — the closed form the DuckDB oracle replays. Covers all four
    planted patterns, both restart and non-restart docs, and all six
    dimension combinations."""
    import numpy as np

    deltas = multimodal.jpeg_pattern_deltas()
    for d in [0, 1, 2, 3, 4, 5, 6, 7, 11, 100, 255, 499]:
        w, h = multimodal._jpeg_fixture_dims(d)
        dw, dh, px = multimodal.decode_jpeg_gray(
            multimodal._jpeg_fixture_payload(d)
        )
        assert (dw, dh) == (w, h)
        bw = w // 8
        for k in range((w // 8) * (h // 8)):
            c = (d * 17 + k * 29) % 256
            exp = np.clip(
                np.array(deltas[(d + k) % 4]).reshape(8, 8) + c, 0, 255
            )
            by, bx = divmod(k, bw)
            got = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.int64)
            assert (got == exp).all(), (d, k)


def test_jpeg_delta_margins_and_zrl_position():
    """The planted coefficients must keep every IDCT pixel delta >= 0.04
    away from a .5 rounding boundary (so round is unambiguous and the
    integer oracle is exact), and the (2,3) pattern must sit at zigzag
    position 17 so the entropy coder is forced through a ZRL symbol."""
    import numpy as np

    m = multimodal._idct_matrix()
    for u, v, coef in multimodal.JPEG_PATTERNS:
        if coef == 0:
            continue
        t = coef * np.outer(m[u], m[v])
        frac = np.abs(t - np.floor(t) - 0.5)
        assert frac.min() > 0.04, (u, v, coef, frac.min())
    assert multimodal._JPEG_ZIGZAG.index(2 * 8 + 3) == 17


def test_jpeg_restart_markers_validated():
    """Docs with id % 3 == 0 and >4 blocks carry DRI=4 restart
    scheduling; a wrong RSTn index must be rejected, and byte stuffing
    must appear somewhere across the fixture population (proving the
    decoder's unstuffing path is actually exercised)."""
    import pytest

    p = multimodal._jpeg_fixture_payload(3)  # 16x24 -> 6 blocks, DRI=4
    i = p.index(b"\xff\xd0")
    bad = p[: i + 1] + b"\xd1" + p[i + 2 :]
    with pytest.raises(ValueError, match="RST"):
        multimodal.decode_jpeg_gray(bad)
    # removing the marker entirely must also fail (entropy stream sees
    # a marker where it expects stuffed data, or runs out of bits)
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_gray(p[: i] + p[i + 2 :])
    sos_stuffed = 0
    for d in range(40):
        payload = multimodal._jpeg_fixture_payload(d)
        scan = payload[payload.index(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            sos_stuffed += 1
    assert sos_stuffed > 0


def test_jpeg_rejects_unsupported_variants():
    import pytest

    p = bytearray(multimodal._jpeg_fixture_payload(1))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2  # progressive SOF2
    with pytest.raises(ValueError, match="baseline"):
        multimodal.decode_jpeg_gray(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        multimodal.decode_jpeg_gray(b"\x00\x01\x02\x03")


def test_jpeg_decode_stats_spark(spark):
    """Spark-side plumbing: synthetic payloads -> mapInPandas decode ->
    integer-exact aggregates match the closed form for a small id set."""
    import numpy as np

    deltas = multimodal.jpeg_pattern_deltas()
    docs = spark.createDataFrame([(d,) for d in [0, 3, 7]], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in multimodal.jpeg_decode_stats(
            multimodal.synthetic_jpeg_payloads(docs, "doc_id"), "doc_id"
        ).collect()
    }
    for d in [0, 3, 7]:
        w, h = multimodal._jpeg_fixture_dims(d)
        px = []
        for k in range((w // 8) * (h // 8)):
            c = (d * 17 + k * 29) % 256
            px.append(
                np.clip(np.array(deltas[(d + k) % 4]) + c, 0, 255)
            )
        allpx = np.concatenate(px)
        r = rows[d]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_blocks"] == (w // 8) * (h // 8)
        assert r["sum_px"] == int(allpx.sum())
        assert r["min_px"] == int(allpx.min())
        assert r["max_px"] == int(allpx.max())
