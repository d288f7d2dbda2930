"""IMA ADPCM codec: spec-level unit checks on the raw encoder/decoder
(the oracle gate already proves Spark==DuckDB; these prove BOTH match
the published algorithm on hand-checkable cases)."""

from __future__ import annotations

import numpy as np

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
