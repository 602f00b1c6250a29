"""GeoTIFF codec round-trips + the Spark binary-column plumbing (S8)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sentinel_imagery_spark.functions.geotiff import (
    decode_geotiff,
    encode_geotiff,
)

TRANSFORM = {"a": 10.0, "b": 0.0, "c": 600000.0, "d": 0.0, "e": -10.0, "f": 4800000.0}


def test_roundtrip_multiband_int32():
    arr = np.arange(3 * 4 * 5, dtype="int32").reshape(3, 4, 5) * 997
    buf = encode_geotiff(arr, TRANSFORM, "epsg:32631", nodata=0)
    out, tf, crs, nodata = decode_geotiff(buf)
    np.testing.assert_array_equal(out, arr)
    assert tf == TRANSFORM
    assert crs == "epsg:32631" and nodata == 0


def test_roundtrip_single_band_uint8_wgs84():
    arr = np.arange(6 * 7, dtype="uint8").reshape(6, 7)
    tf = {"a": 0.25, "b": 0.0, "c": 1.0, "d": 0.0, "e": -0.25, "f": 44.0}
    buf = encode_geotiff(arr, tf, "epsg:4326")
    out, tf2, crs, nodata = decode_geotiff(buf)
    np.testing.assert_array_equal(out[0], arr)
    assert tf2 == tf and crs == "epsg:4326" and nodata is None


def test_header_is_classic_little_endian_tiff():
    buf = encode_geotiff(np.zeros((2, 2), dtype="uint8"), TRANSFORM, "epsg:32631")
    assert buf[:4] == b"II*\x00"


def test_rotated_transform_rejected():
    with pytest.raises(ValueError, match="rotated"):
        encode_geotiff(
            np.zeros((2, 2), dtype="uint8"), {**TRANSFORM, "b": 1.0}, "epsg:32631"
        )


def test_spark_stack_roundtrip(spark):
    """stacked rasters → tif binary column → decoded stacks, end to end
    through the Arrow-batched plumbing."""
    from etl_sentinel_imagery_spark.operators.raster_io import (
        stacks_from_geotiff,
        with_geotiff,
    )

    rows = [
        (
            "p-1",
            ["B02", "B03"],
            2,
            3,
            [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]],
            TRANSFORM,
            "epsg:32631",
            0,
        )
    ]
    from etl_sentinel_imagery_spark.operators.raster import STACK_SCHEMA

    stacked = spark.createDataFrame(rows, schema=STACK_SCHEMA)
    tif_df = with_geotiff(stacked)
    (tif_row,) = tif_df.select("product_id", "tif").collect()
    assert tif_row["tif"][:4] == b"II*\x00"

    back = stacks_from_geotiff(
        tif_df.select("product_id", "tif"), bands_by_id={"p-1": ["B02", "B03"]}
    ).collect()
    assert len(back) == 1
    b = back[0]
    assert b["bands"] == ["B02", "B03"]
    assert b["pixels"] == rows[0][4]
    assert b["crs"] == "epsg:32631" and b["height"] == 2 and b["width"] == 3


def test_cache_sink_geotiff_bytes(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.raster import STACK_SCHEMA
    from etl_sentinel_imagery_spark.operators.raster_io import (
        write_cache_geotiff,
    )

    rows = [
        ("p-a", ["B02"], 2, 2, [[[1, 2], [3, 4]]], TRANSFORM, "epsg:32631", 0),
        ("p-b", ["B02"], 2, 2, [[[5, 6], [7, 8]]], TRANSFORM, "epsg:32631", 0),
    ]
    stacked = spark.createDataFrame(rows, schema=STACK_SCHEMA)
    cache = str(tmp_path / "tif_cache")
    write_cache_geotiff(stacked, cache)
    cached = spark.read.parquet(cache)
    assert cached.count() == 2
    got = {r["uuid"]: r["tif"] for r in cached.collect()}
    arr, _, _, _ = decode_geotiff(got["p-b"])
    np.testing.assert_array_equal(arr[0], np.array([[5, 6], [7, 8]], dtype="int32"))

    # idempotent: rewriting p-a replaces its partition, p-b untouched
    write_cache_geotiff(stacked.filter("product_id = 'p-a'"), cache)
    assert spark.read.parquet(cache).count() == 2


def test_multimodal_default_decoder_handles_tiff():
    from etl_sentinel_imagery_spark.operators.multimodal import default_decoder

    arr = np.arange(3 * 2 * 2, dtype="uint8").reshape(3, 2, 2)
    buf = encode_geotiff(arr, TRANSFORM, "epsg:32631")
    img = default_decoder(buf, {})
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img, np.transpose(arr, (1, 2, 0)))


def test_word_alignment_odd_payload():
    """TIFF 6.0: IFD and out-of-line values must sit on word boundaries
    even when the strip byte count is odd (3x3 uint8 = 9 bytes)."""
    import struct

    buf = encode_geotiff(np.zeros((3, 3), dtype="uint8"), TRANSFORM, "epsg:32631")
    (ifd_offset,) = struct.unpack("<L", buf[4:8])
    assert ifd_offset % 2 == 0
    (n_entries,) = struct.unpack("<H", buf[ifd_offset : ifd_offset + 2])
    for i in range(n_entries):
        off = ifd_offset + 2 + 12 * i
        _tag, ftype, count = struct.unpack("<HHL", buf[off : off + 8])
        size = {2: 1, 3: 2, 4: 4, 12: 8}[ftype] * count
        if size > 4:
            (voff,) = struct.unpack("<L", buf[off + 8 : off + 12])
            assert voff % 2 == 0, f"tag {_tag} value at odd offset {voff}"
    out, _, _, _ = decode_geotiff(buf)
    assert out.shape == (1, 3, 3)
