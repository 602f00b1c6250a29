"""A SECOND, independent mp4/webm writer for cross-checking
functions/video.py (round-4 verdict #7).

This muxer is deliberately written from the published field tables
(ISO/IEC 14496-12 §8, Matroska/EBML RFC 8794 + matroska.org element
registry) with a different construction style from both the parser
and test_video_meta's minimal builders: a declarative (tag, children
| payload) TREE serialized by one generic walker, producing
STRUCTURALLY COMPLETE files — full stbl sample tables (stts/stsc/
stsz/stco), an mdat with payload bytes, free/udta boxes the parser
must skip, the progressive mdat-BEFORE-moov layout, and (webm)
SeekHead/Cues/Cluster elements around the parsed Info/Tracks. The
fixtures therefore exercise the parser on realistic files it did not
author, and the test pins exact dims/timescale/codec values plus a
structural-integrity walk that shares no code with the parser.

Nothing here imports from etl_sentinel_imagery_spark.
"""

from __future__ import annotations

import struct


# --------------------------- mp4 (ISO BMFF) ---------------------------
def _ser_box(node) -> bytes:
    """node = (fourcc, payload_bytes) leaf or (fourcc, [children])
    container; sizes computed bottom-up by the generic walker."""
    tag, body = node
    if isinstance(body, (bytes, bytearray)):
        inner = bytes(body)
    else:
        inner = b"".join(_ser_box(c) for c in body)
    return struct.pack(">I", 8 + len(inner)) + tag + inner


def _fix16(v: float) -> int:
    return int(round(v * 65536))


def mux_mp4(
    width: int = 320,
    height: int = 240,
    movie_timescale: int = 1000,
    media_timescale: int = 12800,
    n_frames: int = 25,
    frame_ticks: int = 512,
    codec: bytes = b"avc1",
    language: str = "eng",
) -> bytes:
    """A complete progressive-layout mp4: ftyp, mdat (before moov —
    the web-download layout), moov with one video trak carrying full
    sample tables, plus free/udta boxes."""
    frame_sizes = [100 + 7 * i for i in range(n_frames)]
    media_duration = n_frames * frame_ticks
    movie_duration = media_duration * movie_timescale // media_timescale

    mdat_payload = b"".join(
        bytes([i % 251]) * s for i, s in enumerate(frame_sizes)
    )
    # chunk offsets: one chunk holding all samples, starting right
    # after ftyp (computed below once ftyp's size is known)
    ftyp = _ser_box((b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom"))
    chunk_offset = len(ftyp) + 8  # mdat header is 8 bytes

    def full(version: int, flags: int, payload: bytes) -> bytes:
        return bytes([version]) + struct.pack(">I", flags)[1:] + payload

    lang_packed = 0
    for ch in language:
        lang_packed = (lang_packed << 5) | (ord(ch) - 0x60)

    unity_matrix = struct.pack(
        ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    mvhd = full(
        0,
        0,
        struct.pack(">II", 3600000000, 3600000000)  # ctime/mtime (1904 epoch)
        + struct.pack(">II", movie_timescale, movie_duration)
        + struct.pack(">i", _fix16(1.0))  # rate
        + struct.pack(">h", 0x0100)  # volume
        + b"\x00" * 10
        + unity_matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = full(
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">II", 3600000000, 3600000000)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", movie_duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer alt volume reserved
        + unity_matrix
        + struct.pack(">II", _fix16(width), _fix16(height)),
    )
    mdhd = full(
        0,
        0,
        struct.pack(">II", 3600000000, 3600000000)
        + struct.pack(">II", media_timescale, media_duration)
        + struct.pack(">HH", lang_packed, 0),
    )
    hdlr = full(0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"Video\x00")
    vmhd = full(0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = full(
        0, 0, struct.pack(">I", 1) + _ser_box((b"url ", full(0, 1, b"")))
    )
    sample_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressorname
        + struct.pack(">H", 0x0018)  # depth
        + struct.pack(">h", -1),
    )
    stsd = full(
        0,
        0,
        struct.pack(">I", 1)
        + struct.pack(">I", 8 + len(sample_entry[0]))
        + codec
        + sample_entry[0],
    )
    stts = full(0, 0, struct.pack(">III", 1, n_frames, frame_ticks))
    stsc = full(0, 0, struct.pack(">IIII", 1, 1, n_frames, 1))
    stsz = full(
        0,
        0,
        struct.pack(">II", 0, n_frames)
        + b"".join(struct.pack(">I", s) for s in frame_sizes),
    )
    stco = full(0, 0, struct.pack(">II", 1, chunk_offset))

    moov = (
        b"moov",
        [
            (b"mvhd", mvhd),
            (
                b"trak",
                [
                    (b"tkhd", tkhd),
                    (
                        b"mdia",
                        [
                            (b"mdhd", mdhd),
                            (b"hdlr", hdlr),
                            (
                                b"minf",
                                [
                                    (b"vmhd", vmhd),
                                    (b"dinf", [(b"dref", dref)]),
                                    (
                                        b"stbl",
                                        [
                                            (b"stsd", stsd),
                                            (b"stts", stts),
                                            (b"stsc", stsc),
                                            (b"stsz", stsz),
                                            (b"stco", stco),
                                        ],
                                    ),
                                ],
                            ),
                        ],
                    ),
                ],
            ),
            (b"udta", [(b"meta", full(0, 0, b""))]),
        ],
    )
    return (
        ftyp
        + _ser_box((b"mdat", mdat_payload))
        + _ser_box(moov)
        + _ser_box((b"free", b"\x00" * 16))
    )


def walk_boxes(buf: bytes):
    """Structural-integrity walk sharing no code with the parser:
    yields (fourcc, start, end) for top-level boxes and asserts sizes
    tile the buffer exactly."""
    pos = 0
    while pos < len(buf):
        assert pos + 8 <= len(buf), "truncated box header"
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        four = buf[pos + 4 : pos + 8]
        assert size >= 8, f"bad size {size} at {pos}"
        assert pos + size <= len(buf), "box overruns file"
        yield four, pos, pos + size
        pos += size
    assert pos == len(buf), "boxes must tile the file exactly"


# ------------------------- webm (Matroska) ---------------------------
def _ebml_size(n: int) -> bytes:
    """Shortest EBML varint encoding of size n (marker bit in the
    leading byte, RFC 8794 §4)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            out = n | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError(n)


def _ser_ebml(node) -> bytes:
    eid, body = node
    if isinstance(body, (bytes, bytearray)):
        inner = bytes(body)
    else:
        inner = b"".join(_ser_ebml(c) for c in body)
    return eid + _ebml_size(len(inner)) + inner


def _u(n: int) -> bytes:
    out = n.to_bytes(8, "big").lstrip(b"\x00")
    return out or b"\x00"


def mux_webm(
    width: int = 640,
    height: int = 360,
    timecode_scale_ns: int = 1_000_000,
    duration_ticks: float = 2345.0,
    video_codec: bytes = b"V_VP9",
    audio_rate: float = 48000.0,
    audio_channels: int = 2,
) -> bytes:
    """A structurally complete webm: EBML header, Segment with
    SeekHead + Info + two TrackEntries (video + Opus audio) + Cues +
    one Cluster with a SimpleBlock — elements beyond Info/Tracks must
    be skipped cleanly by any metadata reader."""
    ebml_header = (
        b"\x1a\x45\xdf\xa3",
        [
            (b"\x42\x86", _u(1)),  # EBMLVersion
            (b"\x42\xf7", _u(1)),  # EBMLReadVersion
            (b"\x42\xf2", _u(4)),  # EBMLMaxIDLength
            (b"\x42\xf3", _u(8)),  # EBMLMaxSizeLength
            (b"\x42\x82", b"webm"),  # DocType
            (b"\x42\x87", _u(4)),  # DocTypeVersion
            (b"\x42\x85", _u(2)),  # DocTypeReadVersion
        ],
    )
    seekhead = (
        b"\x11\x4d\x9b\x74",
        [
            (
                b"\x4d\xbb",
                [
                    (b"\x53\xab", b"\x15\x49\xa9\x66"),  # SeekID: Info
                    (b"\x53\xac", _u(64)),
                ],
            )
        ],
    )
    info = (
        b"\x15\x49\xa9\x66",
        [
            (b"\x2a\xd7\xb1", _u(timecode_scale_ns)),  # TimecodeScale
            (b"\x44\x89", struct.pack(">d", duration_ticks)),  # Duration
            (b"\x4d\x80", b"independent-muxer"),  # MuxingApp
            (b"\x57\x41", b"independent-muxer"),  # WritingApp
        ],
    )
    video_track = (
        b"\xae",
        [
            (b"\xd7", _u(1)),  # TrackNumber
            (b"\x73\xc5", _u(0xAB)),  # TrackUID
            (b"\x83", _u(1)),  # TrackType: video
            (b"\x86", video_codec),  # CodecID
            (
                b"\xe0",  # Video
                [
                    (b"\xb0", _u(width)),  # PixelWidth
                    (b"\xba", _u(height)),  # PixelHeight
                ],
            ),
        ],
    )
    audio_track = (
        b"\xae",
        [
            (b"\xd7", _u(2)),
            (b"\x73\xc5", _u(0xCD)),
            (b"\x83", _u(2)),  # TrackType: audio
            (b"\x86", b"A_OPUS"),
            (
                b"\xe1",  # Audio
                [
                    (b"\xb5", struct.pack(">d", audio_rate)),
                    (b"\x9f", _u(audio_channels)),
                ],
            ),
        ],
    )
    tracks = (b"\x16\x54\xae\x6b", [video_track, audio_track])
    cues = (
        b"\x1c\x53\xbb\x6b",
        [
            (
                b"\xbb",
                [
                    (b"\xb3", _u(0)),  # CueTime
                    (
                        b"\xb7",
                        [(b"\xf7", _u(1)), (b"\xf1", _u(200))],
                    ),
                ],
            )
        ],
    )
    simpleblock = b"\x81\x00\x00\x80" + bytes(range(64))  # track 1, key
    cluster = (
        b"\x1f\x43\xb6\x75",
        [(b"\xe7", _u(0)), (b"\xa3", simpleblock)],  # Timecode + block
    )
    segment = (
        b"\x18\x53\x80\x67",
        [seekhead, info, tracks, cues, cluster],
    )
    return _ser_ebml(ebml_header) + _ser_ebml(segment)
