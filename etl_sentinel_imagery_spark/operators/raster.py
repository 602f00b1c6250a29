"""Raster kernels (tx.py parity) — numpy compute, Spark-grouped execution.

The reference's transform layer (`/root/reference/code/tx.py`): normalize
(R1), clip-by-polygon (R2), band-stack (R3), reproject (R4), first-wins
mosaic (R5), composed as pipelines (R6/R7). rasterio is not available in
this environment, so the kernels are self-contained numpy over an
explicit affine-georeferenced array model:

    pixels: (bands, height, width) int array
    transform: GDAL-style affine (a, b, c, d, e, f):
        x = a·col + b·row + c ;  y = d·col + e·row + f
    (north-up rasters: b = d = 0, e < 0)

Spark execution model per SURVEY.md §2.9: single-raster ops are per-row
(mapInPandas — embarrassingly parallel over products); stack and mosaic
are grouped ops (groupBy(key).applyInPandas) with explicit intra-group
ordering so first-wins semantics stay deterministic under parallelism.
Normalize is pure column arithmetic — it stays JVM-side (nested array
transform, no Python at all).
"""

from __future__ import annotations

import math
from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Affine = tuple[float, float, float, float, float, float]

#: Spark schema fragments for raster rows.
TRANSFORM_TYPE = "struct<a:double,b:double,c:double,d:double,e:double,f:double>"
SINGLE_BAND_SCHEMA = (
    "product_id string, band string, height int, width int, "
    f"pixels array<array<int>>, transform {TRANSFORM_TYPE}, "
    "crs string, nodata int"
)
STACK_SCHEMA = (
    "product_id string, bands array<string>, height int, width int, "
    f"pixels array<array<array<int>>>, transform {TRANSFORM_TYPE}, "
    "crs string, nodata int"
)


# =========================== numpy kernels ===============================
def normalize_s2(arr: np.ndarray) -> np.ndarray:
    """R1 (tx.py:20-23): clip(arr/10000, 0, 1) * 255 → uint8."""
    return (np.clip(arr / 10000.0, 0.0, 1.0) * 255).astype(np.uint8)


def pixel_window(transform: Affine, bbox: tuple[float, float, float, float],
                 height: int, width: int) -> tuple[int, int, int, int]:
    """(row0, row1, col0, col1) half-open pixel window covering bbox —
    the crop geometry of rasterio.mask(crop=True) for north-up rasters."""
    a, b, c, d, e, f = transform
    if b or d:
        raise NotImplementedError("rotated rasters unsupported in clip")
    minx, miny, maxx, maxy = bbox
    col0 = max(int(math.floor((minx - c) / a)), 0)
    col1 = min(int(math.ceil((maxx - c) / a)), width)
    # e < 0: y decreases with row
    row0 = max(int(math.floor((maxy - f) / e)), 0)
    row1 = min(int(math.ceil((miny - f) / e)), height)
    return row0, row1, col0, col1


def clip_to_bbox(
    pixels: np.ndarray, transform: Affine, bbox: tuple[float, float, float, float]
) -> tuple[np.ndarray, Affine]:
    """R2 (tx.py:25-35): crop to bbox, update height/width/transform."""
    bands, h, w = pixels.shape
    r0, r1, c0, c1 = pixel_window(transform, bbox, h, w)
    if r1 <= r0 or c1 <= c0:
        raise ValueError("clip window is empty — AOI outside raster")
    a, b, c, d, e, f = transform
    new_t = (a, b, c + c0 * a, d, e, f + r0 * e)
    return pixels[:, r0:r1, c0:c1], new_t


def resample_nearest(
    pixels: np.ndarray,
    src_transform: Affine,
    dst_transform: Affine,
    dst_shape: tuple[int, int],
    inverse_coord_fn: Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]
    | None = None,
    nodata: int = 0,
) -> np.ndarray:
    """R4 core (tx.py:49-71): nearest-neighbor warp onto a destination
    grid. `inverse_coord_fn` maps destination CRS coords → source CRS
    coords (None = same CRS). Vectorized: one meshgrid, one gather."""
    bands, sh, sw = pixels.shape
    dh, dw = dst_shape
    da, db, dc, dd, de, df_ = dst_transform
    # sample at destination pixel CENTERS (col+0.5, row+0.5)
    cols, rows = np.meshgrid(np.arange(dw) + 0.5, np.arange(dh) + 0.5)
    x = da * cols + db * rows + dc
    y = dd * cols + de * rows + df_
    if inverse_coord_fn is not None:
        x, y = inverse_coord_fn(x, y)
    sa, sb, sc, sd, se, sf = src_transform
    # invert the (assumed north-up) source affine; floor → containing pixel
    src_col = np.floor((x - sc) / sa).astype(int)
    src_row = np.floor((y - sf) / se).astype(int)
    valid = (src_col >= 0) & (src_col < sw) & (src_row >= 0) & (src_row < sh)
    out = np.full((bands, dh, dw), nodata, dtype=pixels.dtype)
    sc_ = np.clip(src_col, 0, sw - 1)
    sr_ = np.clip(src_row, 0, sh - 1)
    for bi in range(bands):
        vals = pixels[bi, sr_, sc_]
        out[bi] = np.where(valid, vals, nodata)
    return out


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Axis-aligned nearest-neighbor resize of (H, W[, C]) — pixel-center
    sampling (source index = floor((i + 0.5) · in/out)), the same
    convention :func:`resample_nearest` uses for warps. Dtype-preserving;
    an integer upscale factor reproduces ``np.repeat`` exactly."""
    h, w = arr.shape[:2]
    rs = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
    cs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
    return arr[rs][:, cs]


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of (H, W[, C]) with half-pixel-center alignment
    and edge clamp (the PIL/OpenCV default convention: source coordinate
    = (i + 0.5) · in/out − 0.5). Interpolates in float64; integer dtypes
    round half-to-even back (np.rint), floats keep their dtype. A
    same-size call is the identity (weights collapse to 0)."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    wy, wx = ys - y0f, xs - x0f
    y0 = np.clip(y0f.astype(int), 0, h - 1)
    y1 = np.clip(y0f.astype(int) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(int), 0, w - 1)
    x1 = np.clip(x0f.astype(int) + 1, 0, w - 1)
    # gather four corners on the (out_h, out_w) grid, then lerp. The
    # extra trailing dims broadcast over an optional channel axis.
    exp = (...,) + (None,) * (arr.ndim - 2)
    wy_, wx_ = wy[:, None][exp], wx[None, :][exp]
    top = a[y0][:, x0] * (1 - wx_) + a[y0][:, x1] * wx_
    bot = a[y1][:, x0] * (1 - wx_) + a[y1][:, x1] * wx_
    out = top * (1 - wy_) + bot * wy_
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(arr.dtype)
    return out.astype(arr.dtype)


def default_wgs84_grid(
    transform: Affine, shape: tuple[int, int], to_wgs84: Callable, n_res: int = None
) -> tuple[Affine, tuple[int, int]]:
    """R4 grid calc (rasterio.calculate_default_transform analog): bound
    the source in WGS84 via its corners, keep the pixel count."""
    h, w = shape
    a, b, c, d, e, f = transform
    corners_x = np.array([0, w, 0, w]) * a + c
    corners_y = np.array([0, 0, h, h]) * e + f
    lon, lat = to_wgs84(corners_x, corners_y)
    minlon, maxlon = float(lon.min()), float(lon.max())
    minlat, maxlat = float(lat.min()), float(lat.max())
    dst_a = (maxlon - minlon) / w
    dst_e = -(maxlat - minlat) / h
    return (dst_a, 0.0, minlon, 0.0, dst_e, maxlat), (h, w)


def mosaic_first(
    rasters: Iterable[tuple[np.ndarray, Affine]], nodata: int = 0
) -> tuple[np.ndarray, Affine]:
    """R5 (tx.py:73-90): merge same-resolution north-up rasters onto the
    union grid; overlap resolved first-wins (method='first'), in the
    ORDER GIVEN — callers must pre-sort for determinism."""
    rasters = list(rasters)
    if not rasters:
        raise ValueError("empty mosaic")
    a0 = rasters[0][1]
    res_x, res_y = a0[0], a0[4]
    minx = min(t[2] for _, t in rasters)
    maxy = max(t[5] for _, t in rasters)
    maxx = max(t[2] + p.shape[2] * res_x for p, t in rasters)
    miny = min(t[5] + p.shape[1] * res_y for p, t in rasters)
    width = int(round((maxx - minx) / res_x))
    height = int(round((miny - maxy) / res_y))
    bands = rasters[0][0].shape[0]
    out = np.full((bands, height, width), nodata, dtype=rasters[0][0].dtype)
    for pix, t in rasters:
        c0 = int(round((t[2] - minx) / res_x))
        r0 = int(round((t[5] - maxy) / res_y))
        h, w = pix.shape[1], pix.shape[2]
        region = out[:, r0 : r0 + h, c0 : c0 + w]
        mask = region == nodata  # first-wins: only fill untouched cells
        region[mask] = pix[mask]
    return out, (res_x, 0.0, minx, 0.0, res_y, maxy)


# --- transverse mercator (UTM↔WGS84), ellipsoidal Krüger series -----------
def utm_inverse(zone: int, northern: bool = True) -> Callable:
    """Ellipsoidal UTM inverse (functions.proj Krüger series) — matches
    PROJ to sub-millimeter within a zone, replacing the round-1
    spherical stand-in (which was off by ~24 km in northing at 45°)."""
    from etl_sentinel_imagery_spark.functions.proj import utm_inverse as _inv

    return _inv(zone, northern)


# =========================== Spark stages ================================
def normalize_pixels_col(pixels: Column | str) -> Column:
    """R1 as pure JVM nested array arithmetic — no Python in the path.
    (floor == numpy's uint8 truncation for non-negative reflectances)."""
    col = F.col(pixels) if isinstance(pixels, str) else pixels
    return F.transform(
        col,
        lambda row: F.transform(
            row,
            lambda px: F.floor(
                F.least(
                    F.greatest(px / F.lit(10000.0), F.lit(0.0)), F.lit(1.0)
                )
                * F.lit(255.0)
            ).cast("int"),
        ),
    )


def _affine(row: pd.Series) -> Affine:
    t = row["transform"]
    return (t["a"], t["b"], t["c"], t["d"], t["e"], t["f"])


def _nested_to_np(value, depth: int) -> np.ndarray:
    """Arrow materializes array<array<...>> as object-dtype ndarrays of
    ndarrays — np.array(...) on those raises; rebuild by explicit stack."""
    if depth == 1:
        return np.asarray(value, dtype=np.int64)
    return np.stack([_nested_to_np(v, depth - 1) for v in value])


def _t_struct(t: Affine) -> dict:
    return dict(zip("abcdef", (float(v) for v in t)))


def stack_bands(single_band_df: DataFrame) -> DataFrame:
    """R3: groupBy(product).applyInPandas — collect a product's bands in
    lexicographic band order (O4, imagery_store.py:67-68) into one
    (bands, h, w) stack."""

    def _stack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("band", ignore_index=True)
        stack = np.stack([_nested_to_np(p, 2) for p in pdf["pixels"]])
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "product_id": [first["product_id"]],
                "bands": [list(pdf["band"])],
                "height": [int(first["height"])],
                "width": [int(first["width"])],
                "pixels": [stack.tolist()],
                "transform": [dict(first["transform"])],
                "crs": [first["crs"]],
                "nodata": [int(first["nodata"])],
            }
        )

    return single_band_df.groupBy("product_id").applyInPandas(
        _stack, schema=STACK_SCHEMA
    )


def clip_stacks(stacked_df: DataFrame, bbox: tuple[float, float, float, float]) -> DataFrame:
    """R2 over stacked products — per-row mapInPandas (no shuffle)."""

    def _clip(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pix = _nested_to_np(r["pixels"], 3)
                clipped, new_t = clip_to_bbox(pix, _affine(r), bbox)
                rows.append(
                    {
                        "product_id": r["product_id"],
                        "bands": list(r["bands"]),
                        "height": clipped.shape[1],
                        "width": clipped.shape[2],
                        "pixels": clipped.tolist(),
                        "transform": _t_struct(new_t),
                        "crs": r["crs"],
                        "nodata": int(r["nodata"]),
                    }
                )
            yield pd.DataFrame(rows)

    return stacked_df.mapInPandas(_clip, schema=STACK_SCHEMA)


def reproject_stacks(stacked_df: DataFrame, dst_crs: str = "epsg:4326") -> DataFrame:
    """R4: nearest-neighbor reprojection to WGS84 (tx.py:49-71), per-row.

    Source CRS 'epsg:326xx' (UTM north) uses the spherical TM inverse;
    'epsg:4326' passes through with a no-op warp."""

    def _reproject(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pix = _nested_to_np(r["pixels"], 3)
                src_t = _affine(r)
                crs = str(r["crs"]).lower()
                if crs == dst_crs:
                    rows.append(r.to_dict())
                    continue
                if not crs.startswith("epsg:326"):
                    raise NotImplementedError(f"source CRS {crs}")
                zone = int(crs[-2:])
                inv = utm_inverse(zone)
                from etl_sentinel_imagery_spark.functions.proj import (
                    utm_forward,
                )

                fwd = utm_forward(zone)  # maps dst grid → src coords

                dst_t, dst_shape = default_wgs84_grid(
                    src_t, (pix.shape[1], pix.shape[2]), inv
                )
                out = resample_nearest(
                    pix, src_t, dst_t, dst_shape, inverse_coord_fn=fwd,
                    nodata=int(r["nodata"]),
                )
                rows.append(
                    {
                        "product_id": r["product_id"],
                        "bands": list(r["bands"]),
                        "height": out.shape[1],
                        "width": out.shape[2],
                        "pixels": out.tolist(),
                        "transform": _t_struct(dst_t),
                        "crs": dst_crs,
                        "nodata": int(r["nodata"]),
                    }
                )
            yield pd.DataFrame(rows)

    return stacked_df.mapInPandas(_reproject, schema=STACK_SCHEMA)


def mosaic_stacks(stacked_df: DataFrame, mosaic_key: Column | None = None) -> DataFrame:
    """R5: groupBy(key).applyInPandas, rows pre-sorted by product_id so
    first-wins is deterministic regardless of shuffle arrival order
    (the explicit-sort-before-reduce mitigation from SURVEY.md §7)."""
    key = mosaic_key if mosaic_key is not None else F.lit("all")
    df = stacked_df.withColumn("mosaic_key", key)
    schema = (
        "mosaic_key string, n_inputs int, bands array<string>, height int, "
        f"width int, pixels array<array<array<int>>>, transform {TRANSFORM_TYPE}, "
        "crs string, nodata int"
    )

    def _mosaic(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("product_id", ignore_index=True)
        rasters = [
            (_nested_to_np(r["pixels"], 3), _affine(r))
            for _, r in pdf.iterrows()
        ]
        nodata = int(pdf.iloc[0]["nodata"])
        out, t = mosaic_first(rasters, nodata=nodata)
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "mosaic_key": [first["mosaic_key"]],
                "n_inputs": [len(pdf)],
                "bands": [list(first["bands"])],
                "height": [out.shape[1]],
                "width": [out.shape[2]],
                "pixels": [out.tolist()],
                "transform": [_t_struct(t)],
                "crs": [first["crs"]],
                "nodata": [nodata],
            }
        )

    return df.groupBy("mosaic_key").applyInPandas(_mosaic, schema=schema)
