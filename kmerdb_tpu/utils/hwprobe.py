"""Bounded TPU-availability answer for tier dispatch.

jax backend init against a tunneled device service BLOCKS INDEFINITELY
while the service is down (observed multi-hour outages on this rig) —
and `on_tpu()` is exactly that init.  Every dispatch site that would
touch jax first routes through tpu_available(), which answers from,
in order:

1. the already-initialized in-process backend (free),
2. the process's platform pinning (JAX_PLATFORMS/jax_platforms without
   a TPU entry can never yield a TPU: init locally, it cannot hang),
3. a fresh cross-process stamp (~/.cache/kmerdb_tpu/hw_stamp.json —
   the same file tests/test_tpu_hardware.py maintains; positive
   verdicts hold 1 h, negative ones 10 min),
4. a clean-env subprocess probe with a hard timeout.

A deaf service therefore costs one bounded probe per TTL window
instead of an unbounded CLI/bench hang, and a healthy machine pays
~5 s once per hour across ALL processes.  KMERDB_HW_PROBE=0 restores
the direct in-process init (and marks probe subprocesses, preventing
recursion).

Reference role: src/instr_set_detect.h measures the machine's
capabilities at runtime; this measures their *availability*.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

_REPO = str(pathlib.Path(__file__).resolve().parents[2])
_STAMP = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "kmerdb_tpu", "hw_stamp.json")

#: positive probes hold for an hour; a negative one only 10 minutes —
#: a stalled service usually wakes within that (same policy as the
#: hardware test suite's _has_tpu)
_TTL_OK = 3600
_TTL_DOWN = 600
#: a positive stamp older than this is re-verified with a bounded
#: subprocess probe before the (unbounded) in-process backend init is
#: attempted — closing the stale-positive hang window: the service
#: dying 50 min into a positive stamp now costs one bounded probe,
#: not a hung CLI
_FRESH_OK = 300


def _read_stamp() -> dict:
    try:
        with open(_STAMP) as f:
            return json.load(f)
    except Exception:
        return {}


def _write_stamp(**kv) -> None:
    st = _read_stamp()
    st.update(kv)
    try:
        os.makedirs(os.path.dirname(_STAMP), exist_ok=True)
        with open(_STAMP, "w") as f:
            json.dump(st, f)
    except OSError:
        pass


def _direct() -> bool:
    """The raw in-process answer (initializes the jax backend)."""
    import jax
    if jax.default_backend() == "tpu":
        return True
    try:
        return "TPU" in jax.devices()[0].device_kind.upper()
    except Exception:
        return False


def _backend_ready() -> bool:
    """True when this process already initialized a jax backend (then
    _direct() is free).  Reads jax internals defensively: a missing
    attribute just falls through to the stamp/probe path."""
    jb = sys.modules.get("jax._src.xla_bridge")
    try:
        return bool(jb is not None and jb._backends)
    except Exception:
        return False


def _cpu_pinned() -> bool:
    """True when this process's platform selection cannot produce a
    TPU backend — then _direct() is a fast local CPU init.  The env
    var alone is only trustworthy when the axon sitecustomize could
    not have rewritten it (it rewrites jax_platforms to 'axon,cpu'
    whenever PALLAS_AXON_POOL_IPS is set)."""
    jm = sys.modules.get("jax")
    if jm is not None:
        try:
            plats = jm.config.jax_platforms
            if plats:
                return ("axon" not in plats and "tpu" not in plats)
        except Exception:
            pass
    envp = os.environ.get("JAX_PLATFORMS", "")
    if envp and "axon" not in envp and "tpu" not in envp:
        return not os.environ.get("PALLAS_AXON_POOL_IPS")
    return False


def machine_probe(timeout_s: int = 75) -> bool:
    """Clean-env subprocess probe of the MACHINE's TPU (parent
    platform pinning dropped), verdict written to the shared stamp."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["KMERDB_HW_PROBE"] = "0"          # the probe must not recurse
    # callers that pinned themselves to CPU by dropping the tunnel
    # registration (tests/conftest.py, tools/soak_parity.py) stash the
    # value so machine-level probes can still see the chip
    stashed = env.pop("KMERDB_STASHED_AXON_IPS", None)
    if stashed is not None and "PALLAS_AXON_POOL_IPS" not in env:
        env["PALLAS_AXON_POOL_IPS"] = stashed
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    ok = False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "from kmerdb_tpu.ops.pallas_gram import on_tpu;"
             "print('YES' if on_tpu() else 'NO')"],
            env=env, capture_output=True, text=True, timeout=timeout_s)
        ok = r.returncode == 0 and "YES" in r.stdout
    except (subprocess.SubprocessError, OSError):
        ok = False
    _write_stamp(probe_ok=ok, probe_ts=time.time())
    return ok


def tpu_available(probe_timeout_s: int = 75) -> bool:
    if _backend_ready():
        return _direct()
    if os.environ.get("KMERDB_HW_PROBE", "1") == "0" or _cpu_pinned():
        return _direct()
    st = _read_stamp()
    age = time.time() - st.get("probe_ts", 0)
    ttl = _TTL_OK if st.get("probe_ok") else _TTL_DOWN
    if age < ttl:
        if not st.get("probe_ok"):
            return False
        if age < _FRESH_OK:
            # fresh positive verdict: the service answered seconds ago,
            # in-process init is near-certain to return promptly
            return _direct()
        # positive but aging: re-verify with the bounded subprocess
        # probe (refreshes the stamp) so a service that died inside the
        # 1 h window costs one bounded probe instead of a hung init
    if not machine_probe(probe_timeout_s):
        return False
    return _direct()
