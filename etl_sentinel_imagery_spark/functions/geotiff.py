"""Pure-numpy baseline GeoTIFF encode/decode (S8).

The reference writes every pipeline artifact as a GTiff via rasterio
(`/root/reference/code/tx.py:28-34, 39-46, 53-70, 80-89`). rasterio/GDAL
are not in this container, so this module implements the minimal slice
of the TIFF 6.0 + GeoTIFF 1.1 specs the pipeline needs, from the public
format documents: little-endian classic TIFF, one strip, uncompressed,
pixel-interleaved; georeferencing via ModelPixelScale + ModelTiepoint
(affine shear terms b/d must be 0 — matching the reference's north-up
rasters), CRS via a minimal GeoKeyDirectory EPSG entry, nodata via the
GDAL_NODATA ASCII tag.

This is a real interchange format: files decode with rasterio/GDAL/PIL
wherever those exist. Spark-side plumbing (binary column encode/decode
over Arrow batches) lives in operators.raster_io.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II"  # little-endian byte order mark
_MAGIC = 42

# tag codes (TIFF 6.0 / GeoTIFF 1.1 / GDAL)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTES = 279
_T_PLANAR = 284
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_GEO_KEYS = 34735
_T_GDAL_NODATA = 42113

# field types
_FT_SHORT = 3
_FT_LONG = 4
_FT_ASCII = 2
_FT_DOUBLE = 12
_FT_SIZE = {_FT_SHORT: 2, _FT_LONG: 4, _FT_ASCII: 1, _FT_DOUBLE: 8}

# dtype → (bits_per_sample, sample_format)  [format: 1=uint, 2=int]
_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("uint16"): (16, 1),
    np.dtype("int32"): (32, 2),
}
_BY_FORMAT = {(bits, fmt): dt for dt, (bits, fmt) in _DTYPES.items()}

# GeoKey ids
_GK_MODEL_TYPE = 1024
_GK_RASTER_TYPE = 1025
_GK_GEOGRAPHIC_CS = 2048
_GK_PROJECTED_CS = 3072


def _epsg(crs: str) -> int:
    low = crs.lower()
    if not low.startswith("epsg:"):
        raise ValueError(f"only epsg:<code> CRS strings supported, got {crs!r}")
    return int(low.split(":", 1)[1])


def encode_geotiff(
    pixels: np.ndarray,
    transform: dict,
    crs: str,
    nodata: int | None = None,
) -> bytes:
    """(bands, H, W) or (H, W) array + affine transform dict
    {a,b,c,d,e,f} (b=d=0) + 'epsg:NNNN' → GeoTIFF bytes."""
    arr = np.asarray(pixels)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    if arr.ndim != 3:
        raise ValueError(f"pixels must be 2-D or 3-D, got shape {arr.shape}")
    if arr.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {arr.dtype}; one of {list(_DTYPES)}")
    if float(transform.get("b", 0.0)) != 0.0 or float(transform.get("d", 0.0)) != 0.0:
        raise ValueError("rotated/sheared transforms cannot be expressed "
                         "with ModelPixelScale + ModelTiepoint")
    bands, h, w = arr.shape
    bits, sfmt = _DTYPES[arr.dtype]
    # chunky (pixel-interleaved) strip: H × W × bands
    data = np.ascontiguousarray(np.transpose(arr, (1, 2, 0))).tobytes()

    epsg = _epsg(crs)
    model_type = 2 if 4000 <= epsg < 5000 else 1  # geographic vs projected
    cs_key = _GK_GEOGRAPHIC_CS if model_type == 2 else _GK_PROJECTED_CS
    geo_keys = [
        (1, 1, 0, 3),  # version, revision, minor, number of keys
        (_GK_MODEL_TYPE, 0, 1, model_type),
        (_GK_RASTER_TYPE, 0, 1, 1),  # PixelIsArea
        (cs_key, 0, 1, epsg),
    ]
    geo_key_shorts = [v for row in geo_keys for v in row]

    scale = (float(transform["a"]), -float(transform["e"]), 0.0)
    tiepoint = (0.0, 0.0, 0.0, float(transform["c"]), float(transform["f"]), 0.0)
    nodata_ascii = (
        (str(int(nodata)).encode() + b"\x00") if nodata is not None else None
    )

    # entries: (tag, field_type, values tuple)
    entries: list[tuple[int, int, tuple]] = [
        (_T_WIDTH, _FT_LONG, (w,)),
        (_T_LENGTH, _FT_LONG, (h,)),
        (_T_BITS, _FT_SHORT, (bits,) * bands),
        (_T_COMPRESSION, _FT_SHORT, (1,)),
        (_T_PHOTOMETRIC, _FT_SHORT, (1,)),  # BlackIsZero
        (_T_STRIP_OFFSETS, _FT_LONG, (8,)),  # data right after header
        (_T_SAMPLES, _FT_SHORT, (bands,)),
        (_T_ROWS_PER_STRIP, _FT_LONG, (h,)),
        (_T_STRIP_BYTES, _FT_LONG, (len(data),)),
        (_T_PLANAR, _FT_SHORT, (1,)),  # chunky
        (_T_SAMPLE_FORMAT, _FT_SHORT, (sfmt,) * bands),
        (_T_PIXEL_SCALE, _FT_DOUBLE, scale),
        (_T_TIEPOINT, _FT_DOUBLE, tiepoint),
        (_T_GEO_KEYS, _FT_SHORT, tuple(geo_key_shorts)),
    ]
    if nodata_ascii is not None:
        entries.append((_T_GDAL_NODATA, _FT_ASCII, (nodata_ascii,)))
    entries.sort(key=lambda e: e[0])

    # TIFF 6.0 requires IFDs and out-of-line values on word boundaries —
    # pad an odd-length strip before placing the IFD
    data_pad = b"\x00" * (len(data) % 2)
    ifd_offset = 8 + len(data) + len(data_pad)
    # IFD: count + 12 bytes/entry + next-IFD pointer; overflow area after
    overflow_offset = ifd_offset + 2 + 12 * len(entries) + 4
    ifd = struct.pack("<H", len(entries))
    overflow = b""

    def _pack_values(ftype: int, values: tuple) -> bytes:
        if ftype == _FT_SHORT:
            return struct.pack(f"<{len(values)}H", *values)
        if ftype == _FT_LONG:
            return struct.pack(f"<{len(values)}L", *values)
        if ftype == _FT_DOUBLE:
            return struct.pack(f"<{len(values)}d", *values)
        if ftype == _FT_ASCII:
            return values[0]
        raise AssertionError(ftype)

    for tag, ftype, values in entries:
        raw = _pack_values(ftype, values)
        count = len(raw) if ftype == _FT_ASCII else len(values)
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            ifd += struct.pack("<HHL", tag, ftype, count) + inline
        else:
            ifd += struct.pack(
                "<HHLL", tag, ftype, count, overflow_offset + len(overflow)
            )
            overflow += raw + b"\x00" * (len(raw) % 2)  # keep values word-aligned
    ifd += struct.pack("<L", 0)  # no next IFD

    header = _II + struct.pack("<HL", _MAGIC, ifd_offset)
    return header + data + data_pad + ifd + overflow


def decode_geotiff(buf: bytes) -> tuple[np.ndarray, dict, str, int | None]:
    """GeoTIFF bytes → ((bands, H, W) array, transform dict, 'epsg:NNNN',
    nodata). Accepts the baseline subset :func:`encode_geotiff` emits."""
    if buf[:2] != _II or struct.unpack("<H", buf[2:4])[0] != _MAGIC:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_offset,) = struct.unpack("<L", buf[4:8])
    (n_entries,) = struct.unpack("<H", buf[ifd_offset : ifd_offset + 2])
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_offset + 2 + 12 * i
        tag, ftype, count = struct.unpack("<HHL", buf[off : off + 8])
        size = _FT_SIZE[ftype] * count
        if size <= 4:
            raw = buf[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack("<L", buf[off + 8 : off + 12])
            raw = buf[voff : voff + size]
        if ftype == _FT_SHORT:
            tags[tag] = struct.unpack(f"<{count}H", raw)
        elif ftype == _FT_LONG:
            tags[tag] = struct.unpack(f"<{count}L", raw)
        elif ftype == _FT_DOUBLE:
            tags[tag] = struct.unpack(f"<{count}d", raw)
        elif ftype == _FT_ASCII:
            tags[tag] = (raw.rstrip(b"\x00").decode(),)

    w, h = tags[_T_WIDTH][0], tags[_T_LENGTH][0]
    bands = tags.get(_T_SAMPLES, (1,))[0]
    bits = tags[_T_BITS][0]
    sfmt = tags.get(_T_SAMPLE_FORMAT, (1,))[0]
    if tags.get(_T_COMPRESSION, (1,))[0] != 1:
        raise ValueError("compressed TIFFs not supported")
    if tags.get(_T_PLANAR, (1,))[0] != 1:
        raise ValueError("planar (band-sequential) TIFFs not supported")
    dtype = _BY_FORMAT[(bits, sfmt)]
    (strip_off,) = tags[_T_STRIP_OFFSETS]
    (strip_len,) = tags[_T_STRIP_BYTES]
    flat = np.frombuffer(buf[strip_off : strip_off + strip_len], dtype=dtype)
    arr = np.transpose(flat.reshape(h, w, bands), (2, 0, 1))

    sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
    tp = tags[_T_TIEPOINT]
    # tiepoint maps raster (i,j) → model (x,y): origin at (i,j)=(0,0)
    c = tp[3] - tp[0] * sx
    f = tp[4] + tp[1] * sy
    transform = {"a": sx, "b": 0.0, "c": c, "d": 0.0, "e": -sy, "f": f}

    geo = tags[_T_GEO_KEYS]
    epsg = None
    for k in range(geo[3]):
        key_id, _loc, _cnt, value = geo[4 + 4 * k : 8 + 4 * k]
        if key_id in (_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS):
            epsg = value
    if epsg is None:
        raise ValueError("no EPSG code in GeoKeyDirectory")

    nodata = None
    if _T_GDAL_NODATA in tags:
        nodata = int(float(tags[_T_GDAL_NODATA][0]))
    return arr, transform, f"epsg:{epsg}", nodata
