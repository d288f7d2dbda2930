"""IMA ADPCM codec: spec-level unit checks on the raw encoder/decoder
(the oracle gate already proves Spark==DuckDB; these prove BOTH match
the published algorithm on hand-checkable cases)."""

from __future__ import annotations

import numpy as np
import pytest

from shortvideohybridanalyticslakehouse_spark.functions import multimodal as mm
from shortvideohybridanalyticslakehouse_spark.functions.multimodal import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    _ima_step,
    adpcm_decode_block,
    adpcm_encode,
    decode_wav_adpcm,
    encode_wav_adpcm,
)


def test_tables_are_the_published_ones():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[-1] == 32767
    assert IMA_INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]
    # step table is strictly increasing (the adaptive property)
    assert all(a < b for a, b in zip(IMA_STEP_TABLE, IMA_STEP_TABLE[1:]))


def test_single_step_hand_computed():
    # pred=0, idx=0 -> step=7. sample 100: diff=100 >= 7,3,1 -> code 7,
    # diffq = 0 + 7 + 3 + 1 = 11 (integer shifts of 7), idx 0+8=8
    code, pred, idx = _ima_step(0, 0, 100)
    assert code == 7
    assert pred == (7 >> 3) + 7 + (7 >> 1) + (7 >> 2)  # 0+7+3+1 = 11
    assert idx == 8
    # negative direction mirrors with the sign bit
    code_n, pred_n, idx_n = _ima_step(0, 0, -100)
    assert code_n == 0xF and pred_n == -11 and idx_n == 8


def test_first_sample_exact_and_roundtrip_error_bounded():
    s = ((np.arange(200, dtype=np.int64) * 29 + 53) % 8001) - 4000
    n, block = adpcm_encode(s)
    dec = adpcm_decode_block(block, n)
    assert n == 200 and dec.size == 200
    assert dec[0] == s[0]  # header carries the first sample verbatim
    # quantization error bounded by the current step: for this ±4000
    # ramp the adapted step stays small
    assert int(np.abs(dec.astype(np.int64) - s).max()) <= 1000


def test_decoder_tracks_encoder_state():
    # decoding must reproduce the ENCODER's internal predictor sequence
    s = [0, 500, -2000, 3000, 3100, -4000, 0, 0, 1, 32767, -32768, 12345]
    n, block = adpcm_encode(s)
    dec = adpcm_decode_block(block, n)
    pred, idx = dec[0], 0
    preds = [pred]
    for v in s[1:]:
        _, pred, idx = _ima_step(int(pred), idx, int(v))
        preds.append(pred)
    assert list(dec) == preds


def test_odd_sample_count_padding_nibble_ignored():
    s = [0, 100, 200, 300]  # 3 nibbles -> one pad nibble in the last byte
    n, block = adpcm_encode(s)
    assert n == 4
    dec = adpcm_decode_block(block, n)
    assert dec.size == 4  # the pad nibble is NOT decoded as a sample


def test_wav_container_roundtrip():
    s = ((np.arange(77, dtype=np.int64) * 13 + 5) % 6001) - 3000
    wav = encode_wav_adpcm(12000, s)
    rate, n, dec = decode_wav_adpcm(wav)
    assert rate == 12000 and n == 77 and dec.size == 77
    _, block = adpcm_encode(s)
    assert list(dec) == list(adpcm_decode_block(block, 77))


def test_adpcm_fuzz_never_crashes():
    """decode_wav_adpcm must either decode or raise ValueError on
    arbitrary bytes AND on truncations/bit-flips of a valid payload —
    the codec-family fuzz contract (test_multimodal.py)."""
    from hypothesis import given, settings, strategies as st

    valid = encode_wav_adpcm(
        8000, ((np.arange(90, dtype=np.int64) * 31 + 7) % 4001) - 2000
    )

    @settings(max_examples=120, deadline=None)
    @given(
        use_valid=st.booleans(),
        cut=st.integers(min_value=0, max_value=120),
        flip_pos=st.integers(min_value=0, max_value=500),
        flip_val=st.integers(min_value=0, max_value=255),
        raw=st.binary(max_size=120),
    )
    def check(use_valid, cut, flip_pos, flip_val, raw):
        if use_valid:
            b = bytearray(valid)
            if flip_pos < len(b):
                b[flip_pos] = flip_val
            payload = bytes(b[: max(0, len(b) - cut)])
        else:
            payload = raw
        try:
            rate, n, dec = decode_wav_adpcm(payload)
            assert 0 <= n <= 65535 and dec.size <= n
        except ValueError:
            pass  # the documented rejection path

    check()


# ---------------------------------------------------------------------------
# Multi-block form (round 8): standard 505-sample / 256-byte blocks with
# a fact chunk; legacy single-block bytes must stay IDENTICAL.
# ---------------------------------------------------------------------------


def _ref_multiblock_decode(samples, spb):
    """Reference: encode chunk-by-chunk carrying the step index, decode
    each block independently — what the container round-trip must equal."""
    idx = 0
    out = []
    for off in range(0, len(samples), spb):
        n, block, idx = mm.adpcm_encode_block(samples[off : off + spb], idx)
        out.append(mm.adpcm_decode_block(block, n))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int16)


def test_multiblock_roundtrip_matches_per_block_reference():
    rng = np.random.default_rng(11)
    for n in (506, 1200, 505 * 3 + 1):
        s = rng.integers(-32768, 32767, n, dtype=np.int64)
        payload = mm.encode_wav_adpcm(16000, s, block_samples=505)
        rate, n_out, dec = mm.decode_wav_adpcm(payload)
        assert (rate, n_out) == (16000, n)
        assert np.array_equal(dec, _ref_multiblock_decode(s, 505))


def test_step_index_carries_across_blocks():
    """A loud first block adapts the step index high; the second block's
    header must inherit it (not reset to 0), which changes its decode."""
    s = np.concatenate(
        [
            np.tile([32000, -32000], 300)[:505],  # drives idx to the top
            np.arange(100, dtype=np.int64),
        ]
    )
    payload = mm.encode_wav_adpcm(8000, s, block_samples=505)
    # block 2 starts at data offset block_align; its header byte 2 is idx
    # locate the data chunk: fact chunk present => multi-block layout
    i = 12
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"data":
            data = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    assert data is not None
    assert data[256 + 2] > 0  # inherited step index, not a reset


def test_large_input_autoblocks_past_the_old_cap():
    n = 70_000  # would have raised at the old 65535 single-block cap
    s = (np.arange(n, dtype=np.int64) * 37 % 8001) - 4000
    payload = mm.encode_wav_adpcm(8000, s)
    rate, n_out, dec = mm.decode_wav_adpcm(payload)
    assert n_out == n and len(dec) == n
    assert np.array_equal(dec, _ref_multiblock_decode(s, 505))


def test_legacy_single_block_bytes_unchanged():
    """Short inputs must emit the exact pre-multiblock container (no
    fact chunk) so committed fixture hashes stay valid."""
    s = ((np.arange(240, dtype=np.int64) * 29) % 8001) - 4000
    payload = mm.encode_wav_adpcm(8000, s)
    assert b"fact" not in payload
    rate, n_out, dec = mm.decode_wav_adpcm(payload)
    assert (rate, n_out) == (8000, 240)
    n_ref, block = mm.adpcm_encode(s)
    assert np.array_equal(dec, mm.adpcm_decode_block(block, n_ref))


def test_block_samples_validation():
    with pytest.raises(ValueError):
        mm.encode_wav_adpcm(8000, [1, 2, 3], block_samples=0)
    with pytest.raises(ValueError):
        mm.encode_wav_adpcm(8000, [1, 2, 3], block_samples=0x10000)


def test_multiblock_fuzz_roundtrip_and_truncation_rejected():
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(1, 2000))
        spb = int(rng.integers(2, 600))
        s = rng.integers(-32768, 32767, n, dtype=np.int64)
        payload = mm.encode_wav_adpcm(8000, s, block_samples=spb)
        rate, n_out, dec = mm.decode_wav_adpcm(payload)
        assert n_out == n
        assert np.array_equal(dec, _ref_multiblock_decode(s, spb))
    # fact claiming more samples than the data holds must raise
    s = rng.integers(-32768, 32767, 1200, dtype=np.int64)
    payload = bytearray(mm.encode_wav_adpcm(8000, s, block_samples=505))
    i = 12
    while i + 8 <= len(payload):
        cid = bytes(payload[i : i + 4])
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fact":
            payload[i + 8 : i + 12] = (10_000_000).to_bytes(4, "little")
        i += 8 + size + (size % 2)
    with pytest.raises(ValueError):
        mm.decode_wav_adpcm(bytes(payload))
