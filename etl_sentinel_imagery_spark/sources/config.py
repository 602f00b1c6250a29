"""Engine configuration — the reference's Hydra config, dependency-free.

`conf/config.yaml` (`/root/reference/conf/config.yaml:1-32`) declares the
AOI path, credentials via ``${oc.env:VAR}`` interpolation, and the
acquisition parameters (dates, platform, product type, cloud ceiling,
resolution, bands, output format). This loader keeps the same file shape
and interpolation syntax but resolves to a plain dataclass — engine knobs
go to ``spark.conf``, not a framework (SURVEY.md §1.1 Config row).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import yaml

_ENV_RE = re.compile(r"\$\{oc\.env:([A-Za-z_][A-Za-z0-9_]*)(?:,([^}]*))?\}")


def _interpolate(value):
    if isinstance(value, str):

        def sub(m: re.Match) -> str:
            default = m.group(2)
            got = os.environ.get(m.group(1), default)
            if got is None:
                raise KeyError(f"environment variable {m.group(1)} is not set")
            return got

        return _ENV_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _interpolate(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_interpolate(v) for v in value]
    return value


@dataclass
class AcquisitionConfig:
    """Defaults mirror the reference's sample config
    (conf/config.yaml:24-32)."""

    platform: str = "SENTINEL-2"
    product_type: str = "S2MSI2A"
    date_start: str = "2023-05-01"
    date_end: str = "2023-09-05"
    cloud_max: float = 4.0
    resolution_m: int = 10
    bands: list[str] = field(default_factory=lambda: ["B02", "B03", "B04", "B08"])
    output_format: str = "UINT8"
    aoi_path: str | None = None
    tile_ids: list[str] = field(default_factory=list)
    imagery_directory: str | None = None
    username: str | None = None
    password: str | None = None

    @property
    def normalize(self) -> bool:
        """UINT8 output implies reflectance normalization (tx.py:111-114)."""
        return self.output_format.upper() == "UINT8"

    def selection_params(self) -> dict:
        return {
            "platform": self.platform,
            "product_type": self.product_type,
            "date_start": self.date_start,
            "date_end": self.date_end,
            "cloud_max": self.cloud_max,
        }


def load_config(path: str) -> AcquisitionConfig:
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    data = _interpolate(raw)
    known = {f for f in AcquisitionConfig.__dataclass_fields__}
    return AcquisitionConfig(**{k: v for k, v in data.items() if k in known})
