"""Token lifecycle (§3.3) and config source (S10) tests."""

from __future__ import annotations

import pytest

from etl_sentinel_imagery_spark.sources.auth import TokenManager
from etl_sentinel_imagery_spark.sources.config import AcquisitionConfig, load_config


class FakeClock:
    def __init__(self):
        self.t = 1_000_000.0

    def __call__(self):
        return self.t


def test_first_call_refreshes_due_to_sentinel():
    clock = FakeClock()
    tokens = iter([f"tok{i}" for i in range(10)])
    tm = TokenManager(fetch_token=lambda: next(tokens), clock=clock)
    assert tm.token() == "tok0"  # year-2000 sentinel forces refresh
    assert tm.refresh_count == 1


def test_token_cached_within_600s_and_refreshed_after():
    clock = FakeClock()
    tokens = iter([f"tok{i}" for i in range(10)])
    tm = TokenManager(fetch_token=lambda: next(tokens), clock=clock)
    assert tm.token() == "tok0"
    clock.t += 599.0
    assert tm.token() == "tok0"  # still cached
    clock.t += 1.0  # exactly 600s old → refresh (>= threshold, :152)
    assert tm.token() == "tok1"
    assert tm.refresh_count == 2


def test_unauthorized_forces_refresh():
    clock = FakeClock()
    tokens = iter([f"tok{i}" for i in range(10)])
    tm = TokenManager(fetch_token=lambda: next(tokens), clock=clock)
    tm.token()
    assert tm.on_unauthorized() == "tok1"
    assert tm.auth_header() == {"Authorization": "Bearer tok1"}


def test_config_defaults_match_reference():
    cfg = AcquisitionConfig()
    assert cfg.selection_params() == {
        "platform": "SENTINEL-2",
        "product_type": "S2MSI2A",
        "date_start": "2023-05-01",
        "date_end": "2023-09-05",
        "cloud_max": 4.0,
    }
    assert cfg.bands == ["B02", "B03", "B04", "B08"]
    assert cfg.normalize  # UINT8 → normalize (tx.py:111-114)


def test_config_env_interpolation(tmp_path, monkeypatch):
    monkeypatch.setenv("CDSE_USER", "alice")
    p = tmp_path / "config.yaml"
    p.write_text(
        "username: ${oc.env:CDSE_USER}\n"
        "password: ${oc.env:CDSE_PASS,fallback}\n"
        "cloud_max: 2.5\n"
        "output_format: FLOAT32\n"
    )
    cfg = load_config(str(p))
    assert cfg.username == "alice"
    assert cfg.password == "fallback"
    assert cfg.cloud_max == 2.5
    assert not cfg.normalize


def test_config_missing_env_raises(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("username: ${oc.env:DEFINITELY_UNSET_VAR_42}\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_config_reference_nested_shape(tmp_path, monkeypatch):
    """A reference-shaped YAML (conf/config.yaml nesting + key names)
    loads with identical semantics — not silently as all-defaults. The
    ignored imagery.api_url must NOT demand its env var."""
    monkeypatch.setenv("COPERNICUSHUB_API_ID", "bob")
    monkeypatch.setenv("COPERNICUSHUB_API_SECRET", "s3cret")
    p = tmp_path / "config.yaml"
    p.write_text(
        "hydra:\n  run:\n    dir: ./outputs\n"
        "cache:\n  feature_dir: cache/s2\n"
        "data:\n  aoi: data/toulouse.geojson\n  crs: epsg:4326\n"
        "  global_dataset: data/tiles.csv\n  tile_ids: []\n"
        "imagery:\n"
        "  api_url: ${oc.env:COPERNICUSHUB_API_URL}\n"
        "  api_id: ${oc.env:COPERNICUSHUB_API_ID}\n"
        "  api_secret: ${oc.env:COPERNICUSHUB_API_SECRET}\n"
        "  start_date: 2023-05-01\n"
        "  end_date: 2023-09-05\n"
        "  platform_name: SENTINEL-2\n"
        "  processing_level: Level-2A\n"
        "  product_type: S2MSI2A\n"
        "  cloud_coverage_max: 7.5\n"
        "  resolution: 10.0\n"
        "  bands: [ 'B02', 'B03' ]\n"
        "  format: UINT8\n"
    )
    cfg = load_config(str(p))
    assert cfg.aoi_path == "data/toulouse.geojson"
    assert cfg.imagery_directory == "cache/s2"
    assert cfg.platform == "SENTINEL-2"
    assert cfg.cloud_max == 7.5
    assert cfg.date_start == "2023-05-01" and cfg.date_end == "2023-09-05"
    assert cfg.resolution_m == 10
    assert cfg.bands == ["B02", "B03"]
    assert cfg.username == "bob" and cfg.password == "s3cret"


def test_config_unknown_key_raises(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("cloud_coverage_maximum: 3.0\n")
    with pytest.raises(ValueError, match="unrecognized config keys"):
        load_config(str(p))
