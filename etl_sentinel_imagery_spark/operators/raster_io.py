"""GeoTIFF binary columns over Spark (S8 plumbing).

The codec (functions.geotiff) is pure numpy; this module is the
distributed seam: stacked rasters gain a ``tif binary`` column, and tif
bytes decode back to typed raster rows — both as Arrow-batched
mapInPandas stages, so pixel payloads move executor-side in columnar
batches and never round-trip through Python row objects. Mirrors the
reference's file-based GTiff write/read cycle
(`/root/reference/code/tx.py:28-34`, `dataset.py:54-59`) with bytes in
the DataFrame instead of paths on a filesystem.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from etl_sentinel_imagery_spark.functions.geotiff import (
    decode_geotiff,
    encode_geotiff,
)
from etl_sentinel_imagery_spark.operators.raster import STACK_SCHEMA


def with_geotiff(stacked: DataFrame, dtype: str = "int32") -> DataFrame:
    """Append ``tif``: each stacked raster encoded as GeoTIFF bytes.

    ``dtype`` picks the sample type ('uint8' after normalization,
    'int32' for raw reflectance counts)."""
    np_dtype = np.dtype(dtype)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stacked.schema.fields
    ) + ", tif binary"

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tifs = []
            for _, r in pdf.iterrows():
                # Arrow delivers nested lists as object ndarrays of
                # ndarrays — stack explicitly per band/row
                arr = np.stack(
                    [
                        np.stack(
                            [np.asarray(row, dtype=np_dtype) for row in band]
                        )
                        for band in r["pixels"]
                    ]
                )
                tifs.append(
                    encode_geotiff(arr, dict(r["transform"]), r["crs"], r["nodata"])
                )
            yield pdf.assign(tif=tifs)

    return stacked.mapInPandas(_encode, schema=out_schema)


def stacks_from_geotiff(
    tifs: DataFrame, id_col: str = "product_id", bands_by_id: dict | None = None
) -> DataFrame:
    """(id, tif binary) rows → STACK_SCHEMA raster rows.

    Band names are not stored in baseline TIFF tags; pass
    ``bands_by_id`` (or accept the positional b0..bN names)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr, transform, crs, nodata = decode_geotiff(r["tif"])
                names = (bands_by_id or {}).get(
                    r[id_col], [f"b{i}" for i in range(arr.shape[0])]
                )
                rows.append(
                    {
                        "product_id": r[id_col],
                        "bands": list(names),
                        "height": arr.shape[1],
                        "width": arr.shape[2],
                        "pixels": arr.astype("int32").tolist(),
                        "transform": transform,
                        "crs": crs,
                        "nodata": 0 if nodata is None else nodata,
                    }
                )
            yield pd.DataFrame(rows)

    return tifs.mapInPandas(_decode, schema=STACK_SCHEMA)


def write_cache_geotiff(stacked: DataFrame, cache_dir: str, dtype: str = "int32") -> None:
    """S8 sink: uuid-keyed GeoTIFF BYTES cache (the reference's
    `{uuid}.tif` files, dataset.py:54), idempotent via dynamic partition
    overwrite — re-running a product replaces exactly its own partition."""
    (
        with_geotiff(stacked, dtype=dtype)
        .withColumnRenamed("product_id", "uuid")
        .select("uuid", "bands", "tif")
        .write.mode("overwrite")
        .partitionBy("uuid")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(cache_dir)
    )
