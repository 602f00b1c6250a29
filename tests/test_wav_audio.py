"""WAV codec round-trips bit-exactly; frame features match signal
theory on synthetic tones; the Spark operator is real end-to-end."""

from __future__ import annotations

import math

import numpy as np
import pytest

from etl_sentinel_imagery_spark.functions.wav import (
    WavParseError,
    decode_wav,
    encode_wav,
    frame_features,
    is_wav,
)
from etl_sentinel_imagery_spark.operators.multimodal import (
    audio_frame_features,
)

RATE = 8000


def _sine(freq, seconds=1.0, amp=0.5, rate=RATE):
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * math.pi * freq * t)


def test_roundtrip_int16_stereo():
    x = (np.stack([_sine(440), _sine(220)], axis=1) * 32767).astype("<i2")
    buf = encode_wav(x, RATE)
    assert is_wav(buf)
    got, rate = decode_wav(buf)
    assert rate == RATE and np.array_equal(got, x)


@pytest.mark.parametrize("dtype", ["uint8", "<i2", "<i4", "<f4"])
def test_roundtrip_all_dtypes(dtype):
    rng = np.random.default_rng(5)
    if dtype == "uint8":
        x = rng.integers(0, 256, size=(1001, 1), dtype="uint8")  # odd data
    elif dtype == "<f4":
        x = rng.standard_normal((500, 2)).astype("<f4")
    else:
        info = np.iinfo(np.dtype(dtype))
        x = rng.integers(
            info.min, info.max, size=(500, 2), dtype=np.dtype(dtype).base
        ).astype(dtype)
    got, rate = decode_wav(encode_wav(x, 44100))
    assert rate == 44100 and np.array_equal(got, x)


def test_aux_chunks_and_pad_are_skipped():
    x = (_sine(440) * 32767).astype("<i2")[:, None]
    buf = bytearray(encode_wav(x, RATE))
    # splice a LIST chunk with odd size between WAVE and fmt
    aux = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    buf2 = bytes(buf[:12]) + aux + bytes(buf[12:])
    # fix RIFF size
    buf2 = b"RIFF" + (len(buf2) - 8).to_bytes(4, "little") + buf2[8:]
    got, rate = decode_wav(buf2)
    assert np.array_equal(got, x)


def test_rejects_non_wav_and_compressed():
    with pytest.raises(WavParseError):
        decode_wav(b"not audio at all, clearly")
    x = (_sine(440) * 32767).astype("<i2")[:, None]
    buf = bytearray(encode_wav(x, RATE))
    i = buf.index(b"fmt ") + 8
    buf[i : i + 2] = (85).to_bytes(2, "little")  # format tag 85 = mp3
    with pytest.raises(WavParseError, match="tag=85"):
        decode_wav(bytes(buf))


def test_frame_features_match_signal_theory():
    # 440 Hz sine, amp 0.5 → rms = 0.5/√2; zcr ≈ 2·f/rate
    x = (_sine(440, amp=0.5) * 32767).astype("<i2")[:, None]
    feats = frame_features(x, RATE, frame_ms=100)
    assert feats.shape == (10, 2)
    assert np.allclose(feats[:, 0], 0.5 / math.sqrt(2), atol=0.01)
    assert np.allclose(feats[:, 1], 2 * 440 / RATE, atol=0.01)
    # silence frames: rms 0, zcr 0
    silent = np.zeros((RATE, 1), dtype="<i2")
    sf = frame_features(silent, RATE, frame_ms=100)
    assert np.allclose(sf, 0.0)


def test_uint8_centering():
    # constant 128 is silence in unsigned 8-bit
    sf = frame_features(
        np.full((800, 1), 128, dtype=np.uint8), RATE, frame_ms=25
    )
    assert np.allclose(sf[:, 0], 0.0)


def test_spark_operator_end_to_end(spark):
    tones = {1: 220, 2: 880}
    rows = [
        (i, bytearray(encode_wav(
            (_sine(f, seconds=0.5) * 32767).astype("<i2")[:, None], RATE
        )))
        for i, f in tones.items()
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = audio_frame_features(media, frame_ms=50).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    for i, f in tones.items():
        frames = by_doc[i]
        assert len(frames) == 10  # 0.5 s / 50 ms
        assert all(r["sample_rate"] == RATE for r in frames)
        zcrs = [r["zcr"] for r in frames]
        assert np.allclose(zcrs, 2 * f / RATE, atol=0.02)
    # higher-pitch doc has strictly higher zcr
    assert max(r["zcr"] for r in by_doc[1]) < min(r["zcr"] for r in by_doc[2])
