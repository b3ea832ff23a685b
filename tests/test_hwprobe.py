"""utils/hwprobe: the bounded TPU-availability answer.

The live-outage behavior (75 s bounded probe instead of an unbounded
backend-init hang) was measured on the rig during the 2026-08-17
service outage; these tests cover the decision ladder and the stamp
TTLs without touching any service.
"""

import time

from kmerdb_tpu.utils import hwprobe


def test_cpu_pinned_answers_fast_without_probe(monkeypatch):
    """Under the conftest's cpu-pinned jax config the answer must come
    from a local init — no subprocess, no stamp."""
    def boom(timeout_s=75):
        raise AssertionError("machine_probe must not run")
    monkeypatch.setattr(hwprobe, "machine_probe", boom)
    t0 = time.time()
    assert hwprobe.tpu_available() is False
    assert time.time() - t0 < 10


def test_stamp_roundtrip(monkeypatch, tmp_path):
    monkeypatch.setattr(hwprobe, "_STAMP", str(tmp_path / "s.json"))
    hwprobe._write_stamp(probe_ok=True, probe_ts=123.0)
    hwprobe._write_stamp(extra="x")          # merges, not replaces
    st = hwprobe._read_stamp()
    assert st["probe_ok"] is True and st["probe_ts"] == 123.0
    assert st["extra"] == "x"


def test_ttl_ladder(monkeypatch, tmp_path):
    """Fresh negative stamp short-circuits; a stale one re-probes."""
    monkeypatch.setattr(hwprobe, "_STAMP", str(tmp_path / "s.json"))
    monkeypatch.setattr(hwprobe, "_backend_ready", lambda: False)
    monkeypatch.setattr(hwprobe, "_cpu_pinned", lambda: False)
    calls = []
    monkeypatch.setattr(hwprobe, "machine_probe",
                        lambda timeout_s=75: (calls.append(1), False)[1])

    hwprobe._write_stamp(probe_ok=False, probe_ts=time.time())
    assert hwprobe.tpu_available() is False
    assert not calls, "fresh negative stamp must not re-probe"

    hwprobe._write_stamp(probe_ok=False,
                         probe_ts=time.time() - hwprobe._TTL_DOWN - 1)
    assert hwprobe.tpu_available() is False
    assert calls, "stale stamp must re-probe"


def test_positive_stamp_falls_through_to_direct(monkeypatch, tmp_path):
    """A fresh positive stamp trusts the machine verdict but still
    answers with THIS process's backend (cpu-pinned here -> False)."""
    monkeypatch.setattr(hwprobe, "_STAMP", str(tmp_path / "s.json"))
    monkeypatch.setattr(hwprobe, "_backend_ready", lambda: False)
    monkeypatch.setattr(hwprobe, "_cpu_pinned", lambda: False)
    hwprobe._write_stamp(probe_ok=True, probe_ts=time.time())
    assert hwprobe.tpu_available() is False
