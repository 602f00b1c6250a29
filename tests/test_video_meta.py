"""mp4/webm container metadata: hand-built spec streams (independent
byte construction, not the parser's own encoder), version/largesize
variants, unknown-size EBML segments, truncation/overrun quarantine,
and the Spark metadata operator."""

from __future__ import annotations

import struct

import pytest

from etl_sentinel_imagery_spark.functions.video import (
    VideoParseError,
    is_mp4,
    is_webm,
    parse_mp4,
    parse_video,
    parse_webm,
)
from etl_sentinel_imagery_spark.operators.multimodal import video_metadata


# --- mp4 builders (straight from ISO 14496-12 field tables) ---------------
def box(four: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + four + payload


def fullbox(four: bytes, version: int, payload: bytes) -> bytes:
    return box(four, bytes([version]) + b"\x00\x00\x00" + payload)


def _lang(code: str) -> int:
    a, b, c = (ord(ch) - 0x60 for ch in code)
    return (a << 10) | (b << 5) | c


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    t = (b"\x00" * 16) if version == 1 else (b"\x00" * 8)
    dur = struct.pack(">Q" if version == 1 else ">I", duration)
    return fullbox(b"mvhd", version, t + struct.pack(">I", timescale) + dur)


def _tkhd(track_id: int, width: int, height: int) -> bytes:
    p = (
        b"\x00" * 8  # ctime mtime (v0)
        + struct.pack(">I", track_id)
        + b"\x00" * 4  # reserved
        + b"\x00" * 4  # duration (v0)
        + b"\x00" * 8  # reserved
        + b"\x00" * 8  # layer alt volume reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    return fullbox(b"tkhd", 0, p)


def _mdhd(timescale: int, duration: int, lang: str = "und") -> bytes:
    p = (
        b"\x00" * 8
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", _lang(lang), 0)
    )
    return fullbox(b"mdhd", 0, p)


def _hdlr(handler: bytes) -> bytes:
    return fullbox(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12)


def _stsd_video(codec: bytes, width: int, height: int) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
    body += struct.pack(">HH", width, height)
    entry = struct.pack(">I", 8 + len(body)) + codec + body
    return fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)


def _stsd_audio(codec: bytes, channels: int, rate: int) -> bytes:
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    entry = struct.pack(">I", 8 + len(body)) + codec + body
    return fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)


def _trak(tkhd: bytes, mdhd: bytes, hdlr: bytes, stsd: bytes) -> bytes:
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", tkhd + mdia)


def build_mp4(mvhd_version: int = 0) -> bytes:
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2avc1")
    v = _trak(
        _tkhd(1, 640, 360),
        _mdhd(30000, 90000, "eng"),
        _hdlr(b"vide"),
        _stsd_video(b"avc1", 640, 360),
    )
    a = _trak(
        _tkhd(2, 0, 0),
        _mdhd(48000, 144000, "und"),
        _hdlr(b"soun"),
        _stsd_audio(b"mp4a", 2, 48000),
    )
    moov = box(b"moov", _mvhd(1000, 3000, mvhd_version) + v + a)
    return ftyp + moov + box(b"mdat", b"\x00" * 32)


# --- EBML builders --------------------------------------------------------
def esize(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("size too large")


def elem(eid: int, payload: bytes) -> bytes:
    return (
        eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        + esize(len(payload))
        + payload
    )


def euint(eid: int, v: int) -> bytes:
    return elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def build_webm(unknown_segment_size: bool = False) -> bytes:
    header = elem(0x1A45DFA3, elem(0x4282, b"webm"))
    info = elem(
        0x1549A966,
        euint(0x2AD7B1, 1_000_000) + elem(0x4489, struct.pack(">d", 12500.0)),
    )
    video = elem(0xAE, (
        euint(0xD7, 1) + euint(0x83, 1) + elem(0x86, b"V_VP9")
        + elem(0xE0, euint(0xB0, 1280) + euint(0xBA, 720))
    ))
    audio = elem(0xAE, (
        euint(0xD7, 2) + euint(0x83, 2) + elem(0x86, b"A_OPUS")
        + elem(0xE1, elem(0xB5, struct.pack(">f", 48000.0)) + euint(0x9F, 2))
    ))
    tracks = elem(0x1654AE6B, video + audio)
    seg_payload = info + tracks
    if unknown_segment_size:
        segment = (0x18538067).to_bytes(4, "big") + b"\xff" + seg_payload
    else:
        segment = elem(0x18538067, seg_payload)
    return header + segment


# --- tests ----------------------------------------------------------------
def test_mp4_parses_tracks_and_duration():
    buf = build_mp4()
    assert is_mp4(buf) and not is_webm(buf)
    i = parse_mp4(buf)
    assert i.container == "mp4" and i.brand == "isom"
    assert i.timescale == 1000 and i.duration == 3.0
    assert len(i.tracks) == 2
    v = next(t for t in i.tracks if t.kind == "video")
    assert (v.track_id, v.codec, v.width, v.height) == (1, "avc1", 640, 360)
    assert (v.timescale, v.duration, v.language) == (30000, 90000, "eng")
    a = next(t for t in i.tracks if t.kind == "audio")
    assert (a.codec, a.channels, a.sample_rate) == ("mp4a", 2, 48000.0)


def test_mp4_mvhd_v1_and_largesize():
    i = parse_mp4(build_mp4(mvhd_version=1))
    assert i.duration == 3.0
    # a 64-bit largesize mdat must not derail the sibling walk
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 8) + b"\x00" * 8
    buf = build_mp4() + big
    assert parse_mp4(buf).duration == 3.0


def test_webm_parses_tracks_and_duration():
    buf = build_webm()
    assert is_webm(buf) and not is_mp4(buf)
    i = parse_webm(buf)
    assert i.container == "webm" and i.brand == "webm"
    # 12500 ticks x 1e6 ns/tick = 12.5 s
    assert i.duration == pytest.approx(12.5)
    v = next(t for t in i.tracks if t.kind == "video")
    assert (v.codec, v.width, v.height) == ("V_VP9", 1280, 720)
    a = next(t for t in i.tracks if t.kind == "audio")
    assert (a.codec, a.sample_rate, a.channels) == ("A_OPUS", 48000.0, 2)


def test_webm_unknown_segment_size():
    """Live-streamed Matroska writes Segment with unknown size — it must
    extend to the end of the buffer."""
    i = parse_webm(build_webm(unknown_segment_size=True))
    assert i.duration == pytest.approx(12.5)
    assert len(i.tracks) == 2


def test_truncation_and_overrun_raise_typed_errors():
    mp4 = build_mp4()
    for cut in (6, 20, len(mp4) // 2):
        with pytest.raises(VideoParseError):
            parse_mp4(mp4[:cut] if cut != 6 else b"\x00\x00\x00\x10ftyp")
    # box claiming to extend past its parent
    bad = box(b"moov", struct.pack(">I", 999) + b"mvhd" + b"\x00" * 8)
    with pytest.raises(VideoParseError, match="overruns"):
        parse_mp4(box(b"ftyp", b"isom") + bad)
    webm = build_webm()
    with pytest.raises(VideoParseError):
        parse_webm(webm[: len(webm) // 2])
    with pytest.raises(VideoParseError):
        parse_video(b"not a container at all")


def test_spark_video_metadata_operator(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(build_mp4())),
            (2, bytearray(build_webm())),
            (3, bytearray(b"garbage payload bytes")),
            (4, bytearray(build_mp4()[:40])),  # truncated mid-moov
        ],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in video_metadata(media).collect()}
    m = out[1]
    assert (m["container"], m["brand"], m["duration_sec"]) == ("mp4", "isom", 3.0)
    assert (m["video_codec"], m["width"], m["height"]) == ("avc1", 640, 360)
    assert (m["audio_codec"], m["sample_rate"], m["channels"]) == ("mp4a", 48000.0, 2)
    assert m["n_tracks"] == 2 and m["parse_error"] is None
    w = out[2]
    assert (w["container"], w["brand"]) == ("webm", "webm")
    assert w["duration_sec"] == pytest.approx(12.5)
    assert (w["video_codec"], w["width"], w["height"]) == ("V_VP9", 1280, 720)
    assert out[3]["parse_error"] and out[3]["container"] is None
    assert out[4]["parse_error"]
