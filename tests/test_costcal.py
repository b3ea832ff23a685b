"""Cost-model calibration: resolution order, cache round-trip, host
probes (device probes need a TPU and are covered by the hardware
suite)."""

import json
import os

import numpy as np
import pytest

from kmerdb_tpu.ops import costcal


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("KMERDB_COST_CACHE_DIR", str(tmp_path))
    return tmp_path


def test_resolve_defaults(cache_dir):
    c = costcal.resolve()
    assert c == costcal.DEFAULTS


def test_env_overrides_cache(cache_dir, monkeypatch):
    (cache_dir / "cost.json").write_text(json.dumps(
        {"version": costcal._VERSION, "push_Bps": 5e9, "fixed_s": 1.0}))
    monkeypatch.setenv("KMERDB_COST_PUSH_BPS", "7e9")
    c = costcal.resolve()
    assert c["push_Bps"] == 7e9          # env beats cache
    assert c["fixed_s"] == 1.0           # cache beats default
    assert c["pull_Bps"] == costcal.DEFAULTS["pull_Bps"]


def test_stale_cache_version_ignored(cache_dir):
    (cache_dir / "cost.json").write_text(json.dumps(
        {"version": costcal._VERSION - 1, "push_Bps": 5e9}))
    assert costcal.resolve()["push_Bps"] == costcal.DEFAULTS["push_Bps"]


def test_host_probe_calibrates_and_caches(cache_dir):
    from kmerdb_tpu.utils import native
    if not native.available:
        pytest.skip("native module unavailable")
    c = costcal.calibrate()
    data = json.loads((cache_dir / "cost.json").read_text())
    assert data["version"] == costcal._VERSION
    # host rates measured, positive, and fed into resolution
    assert data["host_rate"] > 0
    assert data["fill_Bps"] > 0
    assert c["host_rate"] == data["host_rate"]
    # no TPU in the test env: device constants stay at defaults
    assert c["pull_Bps"] == costcal.DEFAULTS["pull_Bps"]
    # second calibrate() is a cache hit (no re-probe): timestamps equal
    costcal.calibrate()
    assert json.loads(
        (cache_dir / "cost.json").read_text())["ts"] == data["ts"]


def test_ensure_calibrated_no_tpu_no_probe(cache_dir):
    costcal.ensure_calibrated()
    # off-TPU: no cache written, defaults returned
    assert not (cache_dir / "cost.json").exists()


def test_calibrate_disabled(cache_dir, monkeypatch):
    monkeypatch.setenv("KMERDB_COST_CALIBRATE", "0")
    c = costcal.ensure_calibrated()
    assert c == costcal.DEFAULTS
    assert not (cache_dir / "cost.json").exists()


def test_resolve_memo_invalidation(monkeypatch, tmp_path):
    """resolve() is memoized (called per dispatch decision) but must
    recompute when the cache file or a KMERDB_COST_* env changes."""
    import json
    from kmerdb_tpu.ops import costcal

    monkeypatch.setenv("KMERDB_COST_CACHE_DIR", str(tmp_path))
    r1 = costcal.resolve()
    assert costcal.resolve() == r1

    (tmp_path / "cost.json").write_text(json.dumps(
        {"version": costcal._VERSION, "push_Bps": 123.0}))
    assert costcal.resolve()["push_Bps"] == 123.0

    monkeypatch.setenv("KMERDB_COST_PUSH_BPS", "456")
    assert costcal.resolve()["push_Bps"] == 456.0
