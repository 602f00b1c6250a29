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


#: Reference nested-key aliases (`/root/reference/conf/config.yaml`):
#: a reference-shaped YAML loads with identical semantics, not defaults.
_REF_ALIASES: dict[tuple[str, str], str] = {
    ("data", "aoi"): "aoi_path",
    ("data", "tile_ids"): "tile_ids",
    ("cache", "feature_dir"): "imagery_directory",
    ("imagery", "start_date"): "date_start",
    ("imagery", "end_date"): "date_end",
    ("imagery", "platform_name"): "platform",
    ("imagery", "product_type"): "product_type",
    ("imagery", "cloud_coverage_max"): "cloud_max",
    ("imagery", "resolution"): "resolution_m",
    ("imagery", "bands"): "bands",
    ("imagery", "format"): "output_format",
    ("imagery", "api_id"): "username",
    ("imagery", "api_secret"): "password",
}
#: Reference keys with no engine equivalent (framework/runtime concerns).
_REF_IGNORED: set[tuple[str, ...]] = {
    ("hydra",),
    ("data", "crs"),
    ("data", "global_dataset"),
    ("imagery", "api_url"),
    ("imagery", "processing_level"),
}
_REF_GROUPS = {g for g, _ in _REF_ALIASES}


def load_config(path: str) -> AcquisitionConfig:
    """Load a flat engine config OR a reference-shaped nested one.

    Unrecognized keys RAISE instead of silently loading defaults — a
    typo'd `cloud_coverage_max` must not quietly select 4.0%-cloud
    products. Alias resolution runs BEFORE env interpolation so ignored
    reference keys (e.g. imagery.api_url) never demand their env vars."""
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    known = set(AcquisitionConfig.__dataclass_fields__)
    out: dict = {}
    unknown: list[str] = []
    for k, v in raw.items():
        if k in known:
            out[k] = v
        elif k in _REF_GROUPS and isinstance(v, dict):
            for kk, vv in v.items():
                tgt = _REF_ALIASES.get((k, kk))
                if tgt is not None:
                    out[tgt] = vv
                elif (k, kk) not in _REF_IGNORED:
                    unknown.append(f"{k}.{kk}")
        elif (k,) not in _REF_IGNORED:
            unknown.append(k)
    if unknown:
        raise ValueError(
            f"unrecognized config keys {unknown} in {path}; "
            f"known: {sorted(known)} plus reference aliases "
            f"{sorted('.'.join(a) for a in _REF_ALIASES)}"
        )
    out = _interpolate(out)
    if "resolution_m" in out:
        out["resolution_m"] = int(float(out["resolution_m"]))
    if "cloud_max" in out:
        out["cloud_max"] = float(out["cloud_max"])
    for key in ("date_start", "date_end"):
        if key in out:
            out[key] = str(out[key])
    return AcquisitionConfig(**out)
