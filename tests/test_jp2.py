"""JPEG2000 structure parser: hand-assembled container/codestream
fixtures (byte layout per ISO/IEC 15444-1 §A/§I), malformed-input
errors, the Spark metadata operator, and the HTTP e2e seam."""

from __future__ import annotations

import struct

import pytest

from etl_sentinel_imagery_spark.functions.jp2 import (
    Jp2ParseError,
    is_jp2,
    parse_jp2,
)

# --- fixture assembly (deterministic byte layout, not a codec) -----------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _siz(
    w=512, h=256, tw=256, th=256, n_comp=3, depth=12, signed=False
) -> bytes:
    ssiz = (depth - 1) | (0x80 if signed else 0)
    body = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, n_comp
    ) + bytes([ssiz, 1, 1]) * n_comp
    return _seg(0xFF51, body)


def _cod(levels=5, prog=2, layers=1, xcb=4, ycb=4, transform=1) -> bytes:
    # xcb/ycb are the raw COD exponent bytes: block width = 1 << (xcb+2)
    body = bytes([0, prog]) + struct.pack(">H", layers) + bytes(
        [0, levels, xcb, ycb, 0, transform]
    )
    return _seg(0xFF52, body)


def _qcd() -> bytes:
    return _seg(0xFF5C, bytes([0x22, 0x90, 0x88, 0x80]))


def _tile_part(isot: int, data: bytes, tpsot=0) -> bytes:
    # SOT(Lsot=10) + SOD + data; Psot spans marker..data end
    psot = 12 + 2 + len(data)
    return (
        struct.pack(">HHHIBB", 0xFF90, 10, isot, psot, tpsot, 1)
        + struct.pack(">H", 0xFF93)
        + data
    )


def _codestream(n_tiles=2, comment=b"synthetic fixture") -> bytes:
    cs = struct.pack(">H", 0xFF4F) + _siz() + _cod() + _qcd()
    cs += _seg(0xFF64, b"\x00\x01" + comment)
    for t in range(n_tiles):
        cs += _tile_part(t, bytes([t]) * (40 + t))
    return cs + struct.pack(">H", 0xFFD9)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _jp2_container(cs: bytes) -> bytes:
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = _box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
    ihdr = _box(
        b"ihdr", struct.pack(">IIHBBBB", 256, 512, 3, 11, 7, 0, 0)
    )
    jp2h = _box(b"jp2h", ihdr)
    return sig + ftyp + jp2h + _box(b"jp2c", cs)


def test_raw_codestream_parses_completely():
    info = parse_jp2(_codestream())
    assert (info.width, info.height) == (512, 256)
    assert info.n_components == 3 and info.bit_depth == 12
    assert not info.signed
    assert (info.tile_width, info.tile_height) == (256, 256)
    assert (info.n_tiles_x, info.n_tiles_y) == (2, 1)
    assert info.decomposition_levels == 5 and info.reversible
    assert info.progression == "RPCL" and info.n_layers == 1
    assert info.codeblock_width == 64 and info.codeblock_height == 64
    assert not info.is_container and info.codestream_offset == 0
    assert info.comments == ("synthetic fixture",)
    assert [tp.tile_index for tp in info.tile_parts] == [0, 1]
    assert [tp.data_length for tp in info.tile_parts] == [40, 41]
    # data offsets actually point at the planted tile bytes
    raw = _codestream()
    for t, tp in enumerate(info.tile_parts):
        assert raw[tp.data_offset : tp.data_offset + tp.data_length] == bytes(
            [t]
        ) * tp.data_length


def test_container_walks_boxes_to_codestream():
    payload = _jp2_container(_codestream())
    assert is_jp2(payload)
    info = parse_jp2(payload)
    assert info.is_container and info.codestream_offset > 0
    assert (info.width, info.height) == (512, 256)


def test_malformed_inputs_raise_parse_error():
    good = _codestream()
    for bad in (
        b"",
        b"\x00" * 16,  # neither signature
        good[:30],  # truncated inside SIZ
        _jp2_container(b"")[:40],  # container without jp2c reach
        struct.pack(">H", 0xFF4F) + _cod(),  # COD before any SIZ, no SIZ
    ):
        with pytest.raises(Jp2ParseError):
            parse_jp2(bad)
    # 9/7 parses as irreversible; unknown transform id raises
    assert not parse_jp2(
        struct.pack(">H", 0xFF4F) + _siz() + _cod(transform=0) + _qcd()
        + struct.pack(">H", 0xFFD9)
    ).reversible
    with pytest.raises(Jp2ParseError):
        parse_jp2(
            struct.pack(">H", 0xFF4F) + _siz() + _cod(transform=9)
            + struct.pack(">H", 0xFFD9)
        )


def test_spark_jp2_metadata_operator_quarantines_corrupt_rows(spark):
    from etl_sentinel_imagery_spark.operators.multimodal import jp2_metadata

    rows = [
        (1, bytearray(_codestream())),
        (2, bytearray(_jp2_container(_codestream(n_tiles=1)))),
        (3, bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in jp2_metadata(media).collect()}
    assert got[1]["width"] == 512 and got[1]["n_tile_parts"] == 2
    assert got[1]["coded_bytes"] == 81 and got[1]["parse_error"] is None
    assert got[2]["n_tiles"] == 2 and got[2]["reversible"]
    assert got[3]["width"] is None and "signature" in got[3]["parse_error"]


def test_default_decoder_reports_parsed_jp2_structure():
    from etl_sentinel_imagery_spark.operators.multimodal import default_decoder

    with pytest.raises(NotImplementedError) as ei:
        default_decoder(_jp2_container(_codestream()), {})
    msg = str(ei.value)
    assert "512x256" in msg and "5/3 reversible" in msg and "2 tile-part" in msg
