"""GIF codec: independent LZW encode/decode cross-check, hand-built
stream decode, compositing/transparency/interlace semantics, and the
Spark frame-table operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_sentinel_imagery_spark.functions.gif import (
    GifParseError,
    decode_gif,
    encode_gif,
    is_gif,
    lzw_decode,
    lzw_encode,
)
from etl_sentinel_imagery_spark.operators.multimodal import gif_frame_table

PALETTE = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def test_lzw_roundtrip_random_and_adversarial():
    rng = np.random.default_rng(23)
    cases = [
        bytes(rng.integers(0, 4, 500, dtype=np.uint8)),
        b"\x00" * 1000,  # maximal dictionary reuse
        bytes([0, 1] * 400),  # KwKwK-heavy
        bytes(rng.integers(0, 256, 6000, dtype=np.uint8)),  # forces 4096 cap
    ]
    for i, px in enumerate(cases):
        mcs = 2 if max(px) < 4 else 8
        dec = lzw_decode(lzw_encode(px, mcs), mcs, len(px))
        assert dec == px, f"case {i}"


def test_lzw_decode_hand_built_stream():
    """Stream assembled by hand from the spec's coding rules (CLEAR,
    literals growing the dictionary, reuse of code 6, END) — decoder
    validated against the spec, not just our own encoder."""
    # min_code_size=2: CLEAR=4 END=5, width starts at 3
    # codes: CLEAR(4), 0, 1, 6(="01"), END(5)  → pixels 0,1,0,1
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (5, 3)]
    acc = n = 0
    buf = bytearray()
    for c, w in codes:
        acc |= c << n
        n += w
        while n >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        buf.append(acc & 0xFF)
    assert lzw_decode(bytes(buf), 2, 4) == bytes([0, 1, 0, 1])


def test_gif_roundtrip_animation():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 4, size=(3, 8, 11), dtype=np.uint8)
    buf = encode_gif(frames, PALETTE, delays=[5, 10, 15])
    assert is_gif(buf)
    rgb, delays = decode_gif(buf)
    assert rgb.shape == (3, 8, 11, 3)
    assert delays == [5, 10, 15]
    for i in range(3):
        assert np.array_equal(rgb[i], PALETTE[frames[i]])


def test_transparency_composites_over_previous_frame():
    """Frame 2 marks color 0 transparent: those pixels must show frame
    1's content (real compositing, not palette lookup)."""
    f1 = np.full((4, 4), 1, dtype=np.uint8)  # all red
    f2 = np.zeros((4, 4), dtype=np.uint8)  # transparent except one px
    f2[2, 2] = 2  # green
    buf = bytearray(encode_gif(np.stack([f1, f2]), PALETTE))
    # set the transparency flag + index 0 on the SECOND graphics control
    # extension (0x21 0xF9 04 <flags> ...)
    hits = []
    i = 0
    while True:
        i = buf.find(b"\x21\xf9\x04", i)
        if i < 0:
            break
        hits.append(i)
        i += 3
    assert len(hits) == 2
    buf[hits[1] + 3] |= 0x01  # transparent flag; index byte is already 0
    rgb, _ = decode_gif(bytes(buf))
    assert np.array_equal(rgb[1][2, 2], PALETTE[2])
    assert np.array_equal(rgb[1][0, 0], PALETTE[1])  # shows frame 1


def test_interlaced_image_deinterlaces():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 4, size=(9, 5), dtype=np.uint8)
    buf = bytearray(encode_gif(frame[None], PALETTE))
    # flip the interlace flag and physically reorder rows into the
    # 4-pass order the flag promises
    i = buf.find(b"\x2c")
    il, it, iw, ih, iflags = struct.unpack("<HHHHB", buf[i + 1 : i + 10])
    order = (
        list(range(0, 9, 8))
        + list(range(4, 9, 8))
        + list(range(2, 9, 4))
        + list(range(1, 9, 2))
    )
    from etl_sentinel_imagery_spark.functions.gif import lzw_encode as enc

    reordered = frame[order].tobytes()
    data = enc(reordered, 2)
    new = bytearray(buf[: i + 1])
    new += struct.pack("<HHHHB", il, it, iw, ih, iflags | 0x40)
    new.append(2)
    for j in range(0, len(data), 255):
        chunk = data[j : j + 255]
        new.append(len(chunk))
        new += chunk
    new += b"\x00\x3b"
    rgb, _ = decode_gif(bytes(new))
    assert np.array_equal(rgb[0], PALETTE[frame])


def test_non_gif_and_truncated_rejected_with_parse_error():
    with pytest.raises(GifParseError):
        decode_gif(b"definitely not a gif at all")
    with pytest.raises(GifParseError):
        decode_gif(b"GIF89a\x04\x00")  # header cut short
    f = np.zeros((4, 4), dtype=np.uint8)
    buf = encode_gif(f[None], PALETTE)
    for cut in (14, len(buf) // 2, len(buf) - 2):
        with pytest.raises(GifParseError):
            decode_gif(buf[:cut])


def test_descriptor_outside_screen_raises_typed_error():
    """An image descriptor extending past the logical screen must raise
    GifParseError, not a numpy broadcast ValueError from the clipped
    canvas slice."""
    f = np.zeros((4, 4), dtype=np.uint8)
    buf = bytearray(encode_gif(f[None], PALETTE))
    i = buf.find(b"\x2c")
    il, it, iw, ih, iflags = struct.unpack("<HHHHB", buf[i + 1 : i + 10])
    buf[i + 1 : i + 10] = struct.pack("<HHHHB", il, it, iw + 3, ih, iflags)
    with pytest.raises(GifParseError, match="logical screen"):
        decode_gif(bytes(buf))


def test_disposal_3_restores_previous_region():
    """Frame 2 draws with disposal 3 (restore previous): its pixels must
    NOT leak into frame 3's composite."""
    f1 = np.full((4, 4), 1, dtype=np.uint8)  # all red
    f2 = np.zeros((4, 4), dtype=np.uint8)  # transparent except (1,1)
    f2[1, 1] = 2  # green
    f3 = np.zeros((4, 4), dtype=np.uint8)  # transparent except (0,0)
    f3[0, 0] = 3  # blue
    buf = encode_gif(
        np.stack([f1, f2, f3]),
        PALETTE,
        disposals=[1, 3, 0],
        transparent=0,
    )
    rgb, _ = decode_gif(buf)
    assert np.array_equal(rgb[1][1, 1], PALETTE[2])  # f2 shows its draw
    assert np.array_equal(rgb[2][0, 0], PALETTE[3])
    # the restore-previous: without it this pixel would still be green
    assert np.array_equal(rgb[2][1, 1], PALETTE[1])
    assert np.array_equal(rgb[2][3, 3], PALETTE[1])


def test_gce_state_does_not_leak_across_frames():
    """Per GIF89a a GCE governs only the next rendering block: strip
    frame 2's GCE and its pixels must render opaquely (no inherited
    transparency) with delay 0 (no inherited delay)."""
    f1 = np.full((4, 4), 1, dtype=np.uint8)
    f2 = np.zeros((4, 4), dtype=np.uint8)
    f2[2, 2] = 2
    buf = bytearray(
        encode_gif(np.stack([f1, f2]), PALETTE, delays=[7, 7], transparent=0)
    )
    second = buf.find(b"\x21\xf9\x04", buf.find(b"\x21\xf9\x04") + 3)
    assert second > 0
    del buf[second : second + 8]  # GCE: intro(2) + size + flags + delay(2) + idx + term
    rgb, delays = decode_gif(bytes(buf))
    assert delays == [7, 0]
    # index 0 draws as palette[0] (opaque black), NOT frame 1's red
    assert np.array_equal(rgb[1][0, 0], PALETTE[0])
    assert np.array_equal(rgb[1][2, 2], PALETTE[2])


def test_gif_sink_roundtrip(spark):
    """Raster-shaped frame table → gif_sink → decode_gif recovers the
    grayscale frames exactly; the payload also flows back through
    gif_frame_table."""
    from etl_sentinel_imagery_spark.operators.multimodal import gif_sink

    rng = np.random.default_rng(17)
    rows = []
    frames_by_doc = {}
    for doc in (1, 2):
        frames = rng.integers(0, 256, size=(3, 5, 6), dtype=np.uint8)
        frames_by_doc[doc] = frames
        for fi in range(3):
            rows.append((doc, fi, [[int(v) for v in row] for row in frames[fi]]))
    df = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx int, pixels array<array<int>>"
    )
    out = {r["doc_id"]: r for r in gif_sink(df, delay_cs=4).collect()}
    for doc in (1, 2):
        assert out[doc]["n_frames"] == 3
        rgb, delays = decode_gif(bytes(out[doc]["payload"]))
        assert delays == [4, 4, 4]
        expect = frames_by_doc[doc]
        for fi in range(3):
            # grayscale palette: every channel equals the input value
            for c in range(3):
                assert np.array_equal(rgb[fi][..., c], expect[fi])
    media = spark.createDataFrame(
        [(d, bytearray(out[d]["payload"])) for d in (1, 2)],
        "doc_id bigint, payload binary",
    )
    ft = gif_frame_table(media).collect()
    assert all(r["parse_error"] is None for r in ft)
    assert len(ft) == 6


def test_spark_frame_table(spark):
    rng = np.random.default_rng(11)
    rows = []
    for doc in (1, 2):
        frames = rng.integers(0, 4, size=(doc + 1, 6, 7), dtype=np.uint8)
        rows.append((doc, bytearray(encode_gif(frames, PALETTE))))
    rows.append((3, bytearray(b"corrupt bytes here")))
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = gif_frame_table(media).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 1]
    assert [r["frame_idx"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [0, 1, 2]
    for doc in (1, 2):
        for r in by_doc[doc]:
            assert (r["height"], r["width"]) == (6, 7)
            assert len(r["channel_means"]) == 3
            assert r["parse_error"] is None
    assert len(by_doc[3]) == 1 and by_doc[3][0]["parse_error"]


def test_real_world_gifs_decode_if_present():
    """Real encoder output (idlelib icons, when present on the host)
    is the convention oracle: a wrong LZW width rule desyncs within a
    few codes on every one of these."""
    import glob
    import os

    # locate portably: any CPython that ships idlelib carries its icon
    # GIFs — no machine-specific install prefix in the path
    try:
        import idlelib
    except ImportError:
        pytest.skip("idlelib not on this host")
    pattern = os.path.join(
        os.path.dirname(idlelib.__file__), "Icons", "*.gif"
    )
    files = sorted(glob.glob(pattern))
    if not files:
        pytest.skip("no real-world gif fixtures on this host")
    for f in files:
        with open(f, "rb") as fh:
            rgb, _ = decode_gif(fh.read())
        assert rgb.ndim == 4 and rgb.shape[3] == 3 and rgb.shape[0] >= 1


def test_gif_flows_through_image_decoder_seam(spark):
    """default_decoder now handles GIF natively: decode_and_summarize
    and resize_media work on GIF payloads with NO injected decoder."""
    from etl_sentinel_imagery_spark.operators.multimodal import (
        decode_and_summarize,
        resize_media,
    )

    rng = np.random.default_rng(5)
    frame = rng.integers(0, 4, size=(10, 12), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_gif(frame[None], PALETTE)))],
        "doc_id bigint, payload binary",
    )
    s = decode_and_summarize(media).collect()[0]
    assert (s["height"], s["width"]) == (10, 12)
    assert len(s["channel_means"]) == 3
    r = resize_media(media, 5, 6, method="nearest").collect()[0]
    assert (r["height"], r["width"]) == (5, 6)
