"""Header-level video-container parsing — mp4 (ISO BMFF) and webm
(Matroska/EBML) — pure stdlib, no codec.

Closes the last modality gap the same way functions/jp2.py closed
JPEG2000: the CONTAINER structure (duration, track layout, codecs,
dimensions, sample rates) parses natively, giving a 100 TB ingest
everything it needs for schema/partition planning and quality gating
(e.g. drop zero-video-track files before paying decode cost), while
frame/sample DECODE stays behind the injectable decoder seam in
operators.multimodal (h264/vp9/opus need codec libraries not present
in this container, and a from-scratch entropy decoder could not be
validated here — the same irreducibility argument as JP2's EBCOT
Tier-1, see ROADMAP.md).

mp4: the ISO base-media box walk — [size:4][fourcc:4] records, size 1
= 64-bit largesize, size 0 = to-end; containers (moov/trak/mdia/minf/
stbl) recurse. Parsed leaves: ftyp (brands), mvhd (movie timescale /
duration, v0+v1), tkhd (track id, 16.16 display dims), mdhd (media
timescale/duration, packed ISO-639 language), hdlr (handler fourcc),
stsd (codec fourcc + VisualSampleEntry dims / AudioSampleEntry
channels + 16.16 sample rate).

webm: EBML varint-ID/varint-size records; unknown-size elements
(live-streamed Segments) extend to the enclosing bound. Parsed:
EBML>DocType, Segment>Info (TimecodeScale ns/tick — default 1e6 —
and float Duration in ticks), Segment>Tracks>TrackEntry (number,
type, CodecID, Video PixelWidth/Height, Audio SamplingFrequency/
Channels).

No reference anchor (the reference has no video path); API mirrors
functions/jp2.py so multimodal metadata operators stay uniform.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


class VideoParseError(ValueError):
    pass


@dataclass
class TrackInfo:
    track_id: int | None = None
    kind: str | None = None  # "video" / "audio" / raw handler or type
    codec: str | None = None
    width: int | None = None
    height: int | None = None
    timescale: int | None = None
    duration: int | None = None
    language: str | None = None
    sample_rate: float | None = None
    channels: int | None = None


@dataclass
class VideoInfo:
    container: str  # "mp4" | "webm"
    brand: str | None  # ftyp major brand / EBML DocType
    timescale: int | None  # movie timescale (mp4) / ns-per-tick (webm)
    duration: float | None  # seconds
    tracks: list = field(default_factory=list)


# --- mp4 / ISO BMFF -------------------------------------------------------
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def is_mp4(buf: bytes) -> bool:
    return len(buf) >= 8 and buf[4:8] == b"ftyp"


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise VideoParseError("truncated box header")
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        four = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise VideoParseError("truncated largesize box")
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise VideoParseError(f"box {four!r} overruns its parent")
        yield four, body, pos + size
        pos += size


def _full(buf: bytes, s: int) -> tuple[int, int]:
    """FullBox version/flags."""
    return buf[s], s + 4


def _parse_stsd(buf: bytes, s: int, e: int, track: TrackInfo) -> None:
    _v, p = _full(buf, s)
    if p + 4 > e:
        raise VideoParseError("truncated stsd")
    n = struct.unpack(">I", buf[p : p + 4])[0]
    p += 4
    if n < 1 or p + 8 > e:
        return
    entry_size = struct.unpack(">I", buf[p : p + 4])[0]
    if entry_size < 8 or p + entry_size > e:
        raise VideoParseError("stsd entry overruns")
    track.codec = buf[p + 4 : p + 8].decode("ascii", "replace")
    body = p + 8
    if track.kind == "video" and body + 28 <= p + entry_size:
        # VisualSampleEntry: 6 reserved + 2 dri + 16 pre_defined/reserved
        track.width, track.height = struct.unpack(
            ">HH", buf[body + 24 : body + 28]
        )
    elif track.kind == "audio" and body + 28 <= p + entry_size:
        # AudioSampleEntry: 6 reserved + 2 dri + 8 reserved, then
        # channelcount(2) samplesize(2) pre_defined(2) reserved(2)
        # samplerate(4, 16.16 fixed)
        track.channels = struct.unpack(">H", buf[body + 16 : body + 18])[0]
        track.sample_rate = (
            struct.unpack(">I", buf[body + 24 : body + 28])[0] / 65536.0
        )


def _parse_trak(buf: bytes, s: int, e: int) -> TrackInfo:
    t = TrackInfo()
    stsd_span = None
    stack = [(s, e)]
    while stack:
        lo, hi = stack.pop()
        for four, bs, be in _boxes(buf, lo, hi):
            if four in _CONTAINERS:
                stack.append((bs, be))
            elif four == b"tkhd":
                v, p = _full(buf, bs)
                p += 16 if v == 1 else 8  # creation+modification times
                t.track_id = struct.unpack(">I", buf[p : p + 4])[0]
                # ...reserved(4) duration(v?8:4) reserved(8) layer(2)
                # alt_group(2) volume(2) reserved(2) matrix(36)
                p += 4 + 4 + (8 if v == 1 else 4) + 8 + 8 + 36
                if p + 8 <= be:
                    w, h = struct.unpack(">II", buf[p : p + 8])
                    if w and h:
                        t.width, t.height = w >> 16, h >> 16
            elif four == b"mdhd":
                v, p = _full(buf, bs)
                p += 16 if v == 1 else 8
                t.timescale = struct.unpack(">I", buf[p : p + 4])[0]
                p += 4
                if v == 1:
                    t.duration = struct.unpack(">Q", buf[p : p + 8])[0]
                    p += 8
                else:
                    t.duration = struct.unpack(">I", buf[p : p + 4])[0]
                    p += 4
                packed = struct.unpack(">H", buf[p : p + 2])[0]
                t.language = "".join(
                    chr(((packed >> sh) & 0x1F) + 0x60) for sh in (10, 5, 0)
                )
            elif four == b"hdlr":
                _v, p = _full(buf, bs)
                handler = buf[p + 4 : p + 8]
                t.kind = {b"vide": "video", b"soun": "audio"}.get(
                    handler, handler.decode("ascii", "replace")
                )
            elif four == b"stsd":
                stsd_span = (bs, be)
    # stsd interpretation depends on hdlr, which may be seen after it
    if stsd_span is not None:
        _parse_stsd(buf, stsd_span[0], stsd_span[1], t)
    return t


def parse_mp4(buf: bytes) -> VideoInfo:
    if not is_mp4(buf):
        raise VideoParseError("not an ISO-BMFF (mp4) stream")
    info = VideoInfo(container="mp4", brand=None, timescale=None, duration=None)
    movie_dur = None
    for four, bs, be in _boxes(buf, 0, len(buf)):
        if four == b"ftyp":
            info.brand = buf[bs : bs + 4].decode("ascii", "replace")
        elif four == b"moov":
            for f2, s2, e2 in _boxes(buf, bs, be):
                if f2 == b"mvhd":
                    v, p = _full(buf, s2)
                    p += 16 if v == 1 else 8
                    info.timescale = struct.unpack(">I", buf[p : p + 4])[0]
                    p += 4
                    movie_dur = struct.unpack(
                        ">Q" if v == 1 else ">I",
                        buf[p : p + (8 if v == 1 else 4)],
                    )[0]
                elif f2 == b"trak":
                    info.tracks.append(_parse_trak(buf, s2, e2))
    if info.timescale and movie_dur is not None:
        info.duration = movie_dur / info.timescale
    return info


# --- webm / Matroska EBML -------------------------------------------------
def is_webm(buf: bytes) -> bool:
    return buf[:4] == b"\x1a\x45\xdf\xa3"


def _vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos → (value, next_pos).

    Element IDs keep the length-marker bit (the spec compares IDs with
    it); sizes strip it. All-ones value bits = unknown size → -1."""
    if pos >= len(buf):
        raise VideoParseError("truncated EBML varint")
    first = buf[pos]
    if first == 0:
        raise VideoParseError("invalid EBML varint length")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(buf):
        raise VideoParseError("truncated EBML varint body")
    if keep_marker:
        v = int.from_bytes(buf[pos : pos + length], "big")
    else:
        v = first & (mask - 1)
        for b in buf[pos + 1 : pos + length]:
            v = (v << 8) | b
        if v == (1 << (7 * length)) - 1:
            v = -1  # unknown size
    return v, pos + length


def _ebml_children(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, p = _vint(buf, pos, keep_marker=True)
        size, p = _vint(buf, p, keep_marker=False)
        e = end if size == -1 else p + size
        if e > end:
            raise VideoParseError(f"EBML element 0x{eid:x} overruns parent")
        yield eid, p, e
        pos = e


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise VideoParseError(f"EBML float of width {n}")


def parse_webm(buf: bytes) -> VideoInfo:
    if not is_webm(buf):
        raise VideoParseError("not an EBML (webm/matroska) stream")
    info = VideoInfo(
        container="webm", brand=None, timescale=1_000_000, duration=None
    )
    dur_ticks = None
    for eid, s, e in _ebml_children(buf, 0, len(buf)):
        if eid == 0x1A45DFA3:  # EBML header
            for cid, cs, ce in _ebml_children(buf, s, e):
                if cid == 0x4282:  # DocType
                    info.brand = buf[cs:ce].decode("ascii", "replace")
        elif eid == 0x18538067:  # Segment
            for cid, cs, ce in _ebml_children(buf, s, e):
                if cid == 0x1549A966:  # Info
                    for iid, is_, ie in _ebml_children(buf, cs, ce):
                        if iid == 0x2AD7B1:
                            info.timescale = _uint(buf, is_, ie)
                        elif iid == 0x4489:
                            dur_ticks = _float(buf, is_, ie)
                elif cid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _ebml_children(buf, cs, ce):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        t = TrackInfo()
                        for fid, fs, fe in _ebml_children(buf, ts, te):
                            if fid == 0xD7:
                                t.track_id = _uint(buf, fs, fe)
                            elif fid == 0x83:
                                t.kind = {1: "video", 2: "audio"}.get(
                                    _uint(buf, fs, fe),
                                    str(_uint(buf, fs, fe)),
                                )
                            elif fid == 0x86:
                                t.codec = buf[fs:fe].decode("ascii", "replace")
                            elif fid == 0xE0:  # Video
                                for vid, vs, ve in _ebml_children(buf, fs, fe):
                                    if vid == 0xB0:
                                        t.width = _uint(buf, vs, ve)
                                    elif vid == 0xBA:
                                        t.height = _uint(buf, vs, ve)
                            elif fid == 0xE1:  # Audio
                                for aid, as_, ae in _ebml_children(buf, fs, fe):
                                    if aid == 0xB5:
                                        t.sample_rate = _float(buf, as_, ae)
                                    elif aid == 0x9F:
                                        t.channels = _uint(buf, as_, ae)
                        info.tracks.append(t)
    if dur_ticks is not None:
        # Duration is in timecode ticks; timescale is ns per tick
        info.duration = dur_ticks * info.timescale / 1e9
    return info


def parse_video(buf: bytes) -> VideoInfo:
    """Sniff + parse either container."""
    if is_mp4(buf):
        return parse_mp4(buf)
    if is_webm(buf):
        return parse_webm(buf)
    raise VideoParseError("neither mp4 nor webm/matroska")
