"""Pure-stdlib GIF87a/89a codec — frames for the video-shaped tier.

The multimodal tier samples frames from video payloads; real video
containers (mp4/webm) need ffmpeg, but animated GIF — a genuinely
common web "video" format — is decodable from scratch: RIFF-style
block structure + LZW (the GIF flavor: variable-width codes LSB-first,
clear/end codes, 12-bit dictionary cap) + frame compositing. So the
video path gets a REAL native format the way functions.wav does for
audio and functions.geotiff for images; mp4-class codecs stay behind
the injectable decoder seam.

Scope (documented, not silent): global + local color tables,
interlaced images (4-pass), transparency, all four disposal methods
(0/1 leave, 2 restore background, 3 restore previous — the region is
snapshotted before the draw and restored after the frame is emitted).
Truncated or out-of-bounds streams raise GifParseError (never a bare
struct/numpy error), so the Spark-side quarantine can rely on one
exception family. Validation is NOT circular: besides the independent
encoder/decoder cross-check (encoder builds the string→code
dictionary, decoder the code→string one including the KwKwK case) and
hand-built spec streams, the decoder is validated against REAL
encoder output (the idlelib icon GIFs shipped with CPython — which is
how the width-bump convention was settled: GIF widens at 2^width with
no TIFF-style early change, and the encoder/decoder dictionaries are
offset by one entry).
"""

from __future__ import annotations

import struct

import numpy as np


class GifParseError(ValueError):
    pass


def is_gif(buf: bytes) -> bool:
    return buf[:6] in (b"GIF87a", b"GIF89a")


# --- LZW ------------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        v = 0
        for i in range(width):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise GifParseError("LZW stream truncated")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR/END,
    dictionary capped at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    r = _BitReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise GifParseError(f"first code {code} not a literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = prev + prev[:1]
        else:
            raise GifParseError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # validated against real-world files (idlelib icons): GIF
            # widens exactly when the dictionary fills 2^width — no
            # TIFF-style early change
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder (dictionary growth, 4096 cap with CLEAR
    reset) — independent of the decoder above by construction."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []

    def reset():
        return {bytes([i]): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    w = b""
    for b in pixels:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the DECODER's dictionary lags this one by a single entry
            # (it adds one code later), so the encoder widens one entry
            # AFTER its own 2^width point — at 2^width + 1 — or the
            # decoder reads the next code one bit short (this exact
            # desync is what the real-file validation caught)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        w = bytes([b])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((end, width))
    # pack LSB-first
    buf = bytearray()
    acc = n = 0
    for code, wd in out_bits:
        acc |= code << n
        n += wd
        while n >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        buf.append(acc & 0xFF)
    return bytes(buf)


# --- container ------------------------------------------------------------
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(buf: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → ((n_frames, H, W, 3) uint8 RGB, per-frame delay in
    hundredths of a second). Frames are COMPOSITED onto the logical
    screen (disposal 0/1 leave, 2 restores background, 3 restores the
    pre-frame region)."""
    if not is_gif(buf):
        raise GifParseError("not a GIF stream")
    if len(buf) < 13:
        raise GifParseError("truncated GIF header")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(buf):
            raise GifParseError("truncated global color table")
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    # real-world files set background indices past the table (idlelib's
    # folder.gif: bg=255, 8-color table) — out-of-range means black
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    transparent: int | None = None
    delay = 0
    disposal = 0

    def read_subblocks(p):
        chunks = []
        while True:
            if p >= len(buf):
                raise GifParseError("truncated sub-block chain")
            n = buf[p]
            p += 1
            if n == 0:
                break
            if p + n > len(buf):
                raise GifParseError("truncated sub-block payload")
            chunks.append(buf[p : p + n])
            p += n
        return b"".join(chunks), p

    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            data, pos = read_subblocks(pos)
            if label == 0xF9 and len(data) >= 4:
                gflags, delay = data[0], struct.unpack("<H", data[1:3])[0]
                disposal = (gflags >> 2) & 7
                transparent = data[3] if gflags & 1 else None
            continue
        if block != 0x2C:
            raise GifParseError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(buf):
            raise GifParseError("truncated image descriptor")
        il, it, iw, ih, iflags = struct.unpack("<HHHHB", buf[pos : pos + 9])
        pos += 9
        if il + iw > w or it + ih > h:
            raise GifParseError(
                "image descriptor exceeds the logical screen"
            )
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(buf):
                raise GifParseError("truncated local color table")
            table = np.frombuffer(
                buf[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifParseError("image with no color table")
        if pos >= len(buf):
            raise GifParseError("truncated image data")
        min_code = buf[pos]
        pos += 1
        data, pos = read_subblocks(pos)
        idx = np.frombuffer(
            lzw_decode(data, min_code, iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        # disposal 3 = restore previous: only the drawn region changes,
        # so snapshotting it is equivalent to snapshotting the canvas
        saved = canvas[it : it + ih, il : il + iw].copy() if disposal == 3 else None
        region = canvas[it : it + ih, il : il + iw]
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            bg_rgb = (
                gct[bg] if gct is not None and bg < len(gct) else 0
            )
            canvas[it : it + ih, il : il + iw] = bg_rgb
        elif disposal == 3:
            canvas[it : it + ih, il : il + iw] = saved
        # per GIF89a a Graphic Control Extension governs only the single
        # following rendering block — without this reset a later frame
        # lacking its own GCE would inherit transparency/disposal/delay
        transparent, disposal, delay = None, 0, 0
    if not frames:
        raise GifParseError("no image blocks")
    return np.stack(frames), delays


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delays: list[int] | None = None,
    disposals: list[int] | None = None,
    transparent: int | None = None,
) -> bytes:
    """(n_frames, H, W) palette-INDEX frames + (n, 3) uint8 palette →
    animated GIF89a bytes (global table, full frames). ``disposals``
    sets each frame's disposal method (default 1 = leave);
    ``transparent`` marks one palette index transparent on every
    frame's GCE. The independent counterpart of decode_gif, and the
    kernel behind the :func:`~...operators.multimodal.gif_sink`
    animation sink."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    nf, h, w = frames.shape
    n_colors = len(palette)
    depth = max(2, int(np.ceil(np.log2(max(n_colors, 2)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n_colors] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    delays = delays or [10] * nf
    disposals = disposals or [1] * nf
    for f, d, disp in zip(frames, delays, disposals):
        gflags = (disp & 7) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags]) + struct.pack("<H", d)
        out += bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = depth
        out.append(min_code)
        data = lzw_encode(f.tobytes(), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
