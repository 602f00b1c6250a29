"""Pure-stdlib RIFF/WAVE PCM codec — the audio twin of functions.geotiff.

The multimodal tier treats audio as opaque binary columns; WAV PCM is
simple enough (RIFF container + raw interleaved samples, Microsoft
spec, public knowledge) that decode/encode need nothing beyond struct
+ numpy — so the audio modality gets a REAL native path the way
baseline GeoTIFF does for images, and the injectable-decoder seam stays
for formats that genuinely need codec libraries (mp3/ogg/aac).

Supported: uncompressed integer PCM (8/16/32-bit; 8-bit is unsigned
per spec) and IEEE float32, any channel count. Samples decode to a
(n_frames, n_channels) numpy array, dtype preserved.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3

_DTYPES = {
    (_FMT_PCM, 8): np.dtype("uint8"),
    (_FMT_PCM, 16): np.dtype("<i2"),
    (_FMT_PCM, 32): np.dtype("<i4"),
    (_FMT_FLOAT, 32): np.dtype("<f4"),
}


class WavParseError(ValueError):
    pass


def is_wav(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, n_channels) samples, sample_rate).

    Walks the RIFF chunk list (fmt may precede or follow auxiliary
    chunks like LIST; data length honors the chunk header, including
    the spec's odd-length pad byte)."""
    if not is_wav(buf):
        raise WavParseError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack(
            "<L", buf[pos + 4 : pos + 8]
        )[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks pad one byte
    if fmt is None or data is None:
        raise WavParseError("missing fmt/data chunk")
    tag, n_ch, rate, _brate, _align, bits = struct.unpack(
        "<HHLLHH", fmt[:16]
    )
    if tag == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        tag = struct.unpack("<H", fmt[24:26])[0]
    dtype = _DTYPES.get((tag, bits))
    if dtype is None:
        raise WavParseError(
            f"unsupported WAV format tag={tag} bits={bits}; inject a "
            "decoder for compressed audio"
        )
    frame_bytes = dtype.itemsize * n_ch
    n_frames = len(data) // frame_bytes
    samples = np.frombuffer(
        data[: n_frames * frame_bytes], dtype=dtype
    ).reshape(n_frames, n_ch)
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) (or 1-D mono) → WAV bytes; dtype picks the
    format (uint8/int16/int32 PCM, float32 IEEE). Round-trips
    :func:`decode_wav` bit-exactly."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {arr.shape}")
    tag_bits = {
        np.dtype("uint8"): (_FMT_PCM, 8),
        np.dtype("<i2"): (_FMT_PCM, 16),
        np.dtype("<i4"): (_FMT_PCM, 32),
        np.dtype("<f4"): (_FMT_FLOAT, 32),
    }.get(arr.dtype.newbyteorder("<"))
    if tag_bits is None:
        raise ValueError(f"unsupported sample dtype {arr.dtype}")
    tag, bits = tag_bits
    n_frames, n_ch = arr.shape
    align = n_ch * bits // 8
    data = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<"))).tobytes()
    fmt = struct.pack(
        "<HHLLHH", tag, n_ch, sample_rate, sample_rate * align, align, bits
    )
    chunks = b"".join(
        (
            b"fmt ", struct.pack("<L", len(fmt)), fmt,
            b"data", struct.pack("<L", len(data)), data,
            b"\x00" if len(data) & 1 else b"",
        )
    )
    return b"RIFF" + struct.pack("<L", 4 + len(chunks)) + b"WAVE" + chunks


def frame_features(
    samples: np.ndarray, sample_rate: int, frame_ms: int = 25
) -> np.ndarray:
    """Per-frame (rms, zero_crossing_rate) over channel-averaged audio —
    the classic first-pass speech/music/silence features. Returns
    (n_frames_out, 2) float64; the trailing partial frame is dropped.

    Integer PCM normalizes to [-1, 1] (8-bit is unsigned per spec, so
    it centers on 128) so thresholds are format-independent."""
    x = samples.astype(np.float64)
    if samples.dtype == np.uint8:
        x = (x - 128.0) / 128.0
    elif np.issubdtype(samples.dtype, np.integer):
        x = x / float(np.iinfo(samples.dtype).max)
    mono = x.mean(axis=1) if x.ndim == 2 else x
    flen = max(int(sample_rate * frame_ms / 1000), 1)
    n = len(mono) // flen
    if n == 0:
        return np.empty((0, 2))
    frames = mono[: n * flen].reshape(n, flen)
    rms = np.sqrt((frames**2).mean(axis=1))
    sgn = np.sign(frames)
    sgn[sgn == 0] = 1.0
    zcr = (np.abs(np.diff(sgn, axis=1)) > 0).mean(axis=1)
    return np.stack([rms, zcr], axis=1)


def _to_mono_float(samples: np.ndarray) -> np.ndarray:
    """Channel-averaged float64 in [-1, 1] (the frame_features
    normalization, factored for the spectral kernels)."""
    x = samples.astype(np.float64)
    if samples.dtype == np.uint8:
        x = (x - 128.0) / 128.0
    elif np.issubdtype(samples.dtype, np.integer):
        x = x / float(np.iinfo(samples.dtype).max)
    return x.mean(axis=1) if x.ndim == 2 else x


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int
) -> np.ndarray:
    """Standard triangular mel filterbank (n_mels, n_fft//2 + 1):
    mel(f) = 2595·log10(1 + f/700), triangle centers equally spaced on
    the mel axis from 0 to Nyquist — the textbook construction every
    speech front end (HTK/librosa lineage) uses."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def inv_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    nyquist = sample_rate / 2.0
    pts_hz = inv_mel(np.linspace(0.0, float(mel(nyquist)), n_mels + 2))
    bin_hz = np.linspace(0.0, nyquist, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, ctr, hi = pts_hz[m], pts_hz[m + 1], pts_hz[m + 2]
        up = (bin_hz - lo) / max(ctr - lo, 1e-12)
        down = (hi - bin_hz) / max(hi - ctr, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def log_mel_spectrogram(
    samples: np.ndarray,
    sample_rate: int,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_mels: int = 16,
) -> np.ndarray:
    """Log-mel spectrogram — THE standard learned-audio input feature:
    Hann-windowed frames → |rfft|² power → mel filterbank → log10 with
    a -100 dB floor (silence stays finite). Returns (n_frames, n_mels)
    float64; trailing samples that don't fill a frame are dropped.
    Pure numpy (np.fft.rfft) — no DSP library required."""
    mono = _to_mono_float(samples)
    flen = max(int(sample_rate * frame_ms / 1000), 2)
    hop = max(int(sample_rate * hop_ms / 1000), 1)
    if len(mono) < flen:
        return np.empty((0, n_mels))
    n_frames = 1 + (len(mono) - flen) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hanning(flen)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(n_mels, flen, sample_rate)
    return np.log10(power @ fb.T + 1e-10)
