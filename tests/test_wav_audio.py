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


def test_mel_filterbank_shape_and_coverage():
    """Triangles cover the spectrum: every FFT bin above the first
    triangle's start has positive total weight, each filter peaks at 1
    near its center, shapes are (n_mels, n_fft//2+1)."""
    from etl_sentinel_imagery_spark.functions.wav import mel_filterbank

    fb = mel_filterbank(16, 400, 16000)
    assert fb.shape == (16, 201)
    assert np.all(fb >= 0)
    assert np.allclose(fb.max(axis=1), 1.0, atol=0.35)  # discrete peaks
    # interior bins are covered by at least one triangle
    covered = fb.sum(axis=0)
    assert np.all(covered[5:-1] > 0)


def test_log_mel_tone_concentrates_in_right_band():
    """A pure 1 kHz tone at 16 kHz: the hottest mel band must be the one
    whose center is nearest 1 kHz, in every frame."""
    from etl_sentinel_imagery_spark.functions.wav import (
        log_mel_spectrogram,
        mel_filterbank,
    )

    rate, f0 = 16000, 1000.0
    t = np.arange(rate) / rate  # 1 second
    tone = (0.8 * np.sin(2 * np.pi * f0 * t)).astype(np.float64)
    spec = log_mel_spectrogram(tone, rate, frame_ms=25, hop_ms=10, n_mels=16)
    flen = int(rate * 0.025)
    assert spec.shape == (1 + (rate - flen) // int(rate * 0.010), 16)
    # expected band: argmax of filter response at the tone's FFT bin
    fb = mel_filterbank(16, flen, rate)
    bin_hz = np.linspace(0, rate / 2, flen // 2 + 1)
    tone_bin = int(np.argmin(np.abs(bin_hz - f0)))
    want_band = int(np.argmax(fb[:, tone_bin]))
    assert np.all(spec.argmax(axis=1) == want_band)


def test_log_mel_silence_floor_and_short_input():
    from etl_sentinel_imagery_spark.functions.wav import log_mel_spectrogram

    spec = log_mel_spectrogram(np.zeros(16000), 16000, n_mels=8)
    assert np.all(spec == -10.0)  # log10(1e-10) floor, finite
    assert log_mel_spectrogram(np.zeros(10), 16000).shape == (0, 16)


def test_spark_audio_spectrogram_operator(spark):
    """WAV payloads through the Spark operator: per-frame log_mel rows,
    tone payload peaks in the same band as the driver-side kernel."""
    from etl_sentinel_imagery_spark.functions.wav import (
        encode_wav,
        log_mel_spectrogram,
    )
    from etl_sentinel_imagery_spark.operators.multimodal import (
        audio_spectrogram,
    )

    rate = 8000
    t = np.arange(rate // 2) / rate
    tone = (0.5 * np.sin(2 * np.pi * 500.0 * t) * 32767).astype(np.int16)
    payload = encode_wav(tone[:, None], rate)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    rows = sorted(
        audio_spectrogram(media, n_mels=12).collect(),
        key=lambda r: r["frame_idx"],
    )
    want = log_mel_spectrogram(tone[:, None], rate, n_mels=12)
    assert len(rows) == want.shape[0]
    for r in rows:
        assert r["sample_rate"] == rate
        assert len(r["log_mel"]) == 12
        np.testing.assert_allclose(
            r["log_mel"], want[r["frame_idx"]], atol=1e-12
        )
