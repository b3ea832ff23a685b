"""Measured-on-this-machine cost-model calibration.

The device/host tier dispatch (ops/device_a2a.device_cost_s /
host_cost_s) needs five machine constants: push and pull bandwidth,
sustained kernel FLOPS, host scatter rate, and a per-process fixed
cost.  Round 2 froze them to the tunneled bench rig's measurements,
which grossly overestimates device cost on a directly-attached TPU
host.  This module plays the reference's measure-the-machine role
(runtime CPUID dispatch, src/instr_set_detect.h:26-57): a one-time
microprobe suite, cached to ~/.cache/kmerdb_tpu/cost.json, so every
process on the same machine picks the right tier with no env vars.

Resolution order for each constant: KMERDB_COST_* env override >
cached calibration > conservative built-in default (the round-2 rig
numbers — the slowest plausible machine, so an uncalibrated host
never wrongly sends small jobs to a slow tunnel).

Probe protocol (all small, bounded, ~2-6 s warm / one service init
cold): timings sync via np.asarray — block_until_ready under-waits
through tunneled PJRT transports.
"""

import json
import os
import pathlib
import time

import numpy as np

#: conservative built-in defaults == the round-2 tunneled-rig numbers
DEFAULTS = {
    "push_Bps": 1.0e9,
    "pull_Bps": 1.0e7,
    "dev_flops": 1.5e13,
    "host_rate": 2.0e10,
    # the tile-blocked scatter lifted the spilled-cache rate ~1.5x on
    # the round-2 rig (192 s -> 126 s at S=4096); higher host speed is
    # the conservative direction (keeps jobs off a slow device path)
    "host_rate_big": 3.0e9,
    "fixed_s": 8.0,
    "fill_Bps": 2.0e9,
}

_ENV = {
    "push_Bps": "KMERDB_COST_PUSH_BPS",
    "pull_Bps": "KMERDB_COST_PULL_BPS",
    "dev_flops": "KMERDB_COST_DEV_FLOPS",
    "host_rate": "KMERDB_COST_HOST_RATE",
    "host_rate_big": "KMERDB_COST_HOST_RATE_BIG",
    "fixed_s": "KMERDB_COST_DEV_FIXED_S",
    "fill_Bps": "KMERDB_COST_FILL_BPS",
}

#: bump when the probe protocol changes (invalidates old caches)
#: v2: host kernels are threaded — host_rate/host_rate_big/fill_Bps
#: are now measured at the machine's thread count (recorded as
#: host_threads), so v1 single-thread rates underestimate real hosts
#: v3: dev_flops chains are adaptive + plausibility-clamped and
#: fixed_s is stall-capped — v2 caches can hold exactly the poisoned
#: values (4.1e17 FLOP/s, 233 s fixed) these changes exist to prevent
_VERSION = 3


def cache_path() -> pathlib.Path:
    base = os.environ.get("KMERDB_COST_CACHE_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "kmerdb_tpu")
    return pathlib.Path(base) / "cost.json"


def _load_cache() -> dict | None:
    try:
        d = json.loads(cache_path().read_text())
        if d.get("version") == _VERSION:
            return d
    except (OSError, ValueError):
        pass
    return None


#: memo for resolve(): (env values + cache-file stat) -> constants.
#: The dispatch calls resolve() per cost decision — O(P^2) times in a
#: parts grid — and the constants can only change via env (keyed) or a
#: cache rewrite (stat-keyed), so re-reading the file each time is
#: pure waste on the 1-vCPU host.
_memo: tuple | None = None


def resolve() -> dict:
    """Effective cost constants: env > cache > defaults.  Never runs
    probes (call calibrate() for that)."""
    global _memo
    env_vals = tuple(os.environ.get(e) for e in _ENV.values())
    env_vals += (os.environ.get("KMERDB_COST_CACHE_DIR"),
                 os.environ.get("XDG_CACHE_HOME"))
    try:
        st = cache_path().stat()
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    key = (env_vals, stamp)
    if _memo is not None and _memo[0] == key:
        return dict(_memo[1])
    out = dict(DEFAULTS)
    cached = _load_cache()
    if cached:
        for k in DEFAULTS:
            if k in cached:
                out[k] = float(cached[k])
    for k, env in _ENV.items():
        v = os.environ.get(env)
        if v is not None:
            out[k] = float(v)
    _memo = (key, dict(out))
    return out


def _probe_device() -> dict:
    """Push/pull bandwidth + sustained packed-Gram FLOPS on the
    attached device (must only be called when on_tpu())."""
    from .._jaxinit import jax_modules
    from . import pallas_gram
    jax, jnp = jax_modules()
    from . import device_a2a

    engine, kt, tile = device_a2a._geometry(4096)
    res: dict = {}

    # one tiny kernel first: absorbs the service init so the
    # bandwidth probes measure steady state, and times a compile
    t0 = time.perf_counter()
    Bp0 = jax.device_put(np.zeros((kt // 8, tile), np.uint8))
    w0 = jax.device_put(np.zeros((kt, 1), np.uint32))
    C0 = jax.device_put(np.zeros((tile, tile), np.uint32))
    np.asarray(pallas_gram.gram_u32_pk_tri(
        Bp0, w0, C0, n_limbs=1, kt=kt, tile=tile, engine=engine))
    res["probe_init_s"] = time.perf_counter() - t0

    # push: 16 MB of random bytes (content caches can't dedup)
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, size=16 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    x = jax.device_put(buf)
    np.asarray(x[:8])            # sync without pulling the payload
    dt = time.perf_counter() - t0
    res["push_Bps"] = buf.nbytes / max(dt, 1e-6)

    # pull: the same 16 MB back
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    res["pull_Bps"] = buf.nbytes / max(dt, 1e-6)

    # kernel: chained aliased triangle Gram on resident synthetic
    # packed data (P = 128 * kt rows, S = 2 * tile), differenced
    P_rows = 128 * kt
    S = 2 * tile
    Bp = jax.device_put(rng.integers(0, 256, size=(P_rows // 8, S),
                                     dtype=np.uint8))
    w = jax.device_put(np.ones((P_rows, 1), dtype=np.uint32))
    ex = device_a2a.aot_compile(
        ("group_step", 1, False, engine, kt, tile),
        device_a2a._jit_group_step(1, False, engine, kt, tile),
        jax.ShapeDtypeStruct((S, S), jnp.uint32),
        jax.ShapeDtypeStruct((P_rows // 8, S), jnp.uint8),
        jax.ShapeDtypeStruct((P_rows, 1), jnp.uint32))

    def chain(n):
        C = jax.device_put(np.zeros((S, S), dtype=np.uint32))
        t0 = time.perf_counter()
        for _ in range(n):
            C = ex(C, Bp, w)
        np.asarray(C)
        return time.perf_counter() - t0

    chain(1)
    # adaptive chain lengths: the differenced window must dwarf the
    # tunnel's sync jitter or the quotient is garbage (a too-short
    # window measured 4.1e17 FLOP/s here — 1000x over the chip peak
    # — which then poisoned every tier decision; same gate as
    # kernel_bench, commit d48fc4c)
    n1, n2 = 2, 6
    while True:
        t1, t2 = chain(n1), chain(n2)
        if t2 - t1 >= 0.3 or n2 >= 384:
            break
        n1 *= 4
        n2 *= 4
    nt = S // tile
    flops = 2.0 * P_rows * S * S * (nt + 1) / (2 * nt)
    raw = flops * (n2 - n1) / max(t2 - t1, 1e-6)
    res["dev_flops_raw"] = raw
    # clamp to a physically plausible ceiling (v5e int8 MXU peak is
    # 3.94e14); beyond it the measurement is wrong, and for dispatch a
    # too-fast device constant is the dangerous direction
    res["dev_flops"] = min(raw, 5.0e14)
    # fixed per-process cost: service init + the typical 4-program
    # compile set (measured here as the init probe, floored at 2 s).
    # Capped at 30 s: tunneled rigs show first-pass service stalls of
    # 25 s-19 min that are one-off variance, not the per-process cost
    # — dispatching every future job on the worst observed stall would
    # strand the device tier's steady-state wins (the raw value stays
    # in the cache for diagnosis).
    res["fixed_s"] = max(2.0, min(res["probe_init_s"], 30.0))
    return res


def _probe_host() -> dict:
    """Host scatter rates (cache-resident and spilled) and packed
    incidence fill bandwidth."""
    from ..utils import native
    res: dict = {}
    rng = np.random.default_rng(1)

    def scatter_rate(S, n_pat, plen):
        offs = np.arange(0, n_pat * plen + 1, plen, dtype=np.int64)
        # ascending within each pattern: the kernel's documented
        # precondition (real pattern/group id lists are ascending)
        sids = np.sort(rng.integers(0, S, size=(n_pat, plen),
                                    dtype=np.uint32), axis=1).ravel()
        w = np.ones(n_pat, dtype=np.uint32)
        t0 = time.perf_counter()
        native.a2a_dense(offs, sids, w, S)
        dt = time.perf_counter() - t0
        return n_pat * plen * plen / max(dt, 1e-6)

    if native.available:
        # the threaded kernels use their live thread count, so these
        # rates reflect the machine's parallel host tier; the count is
        # recorded so a calibration from a different -t is explainable
        res["host_threads"] = native.get_threads()
        res["host_rate"] = scatter_rate(512, 20_000, 24)
        res["host_rate_big"] = scatter_rate(2048, 8_000, 24)
        # fill: bit-packed incidence of 20k patterns x 2048 samples
        n_pat, S, plen = 20_000, 2048, 24
        offs = np.arange(0, n_pat * plen + 1, plen, dtype=np.int64)
        sids = rng.integers(0, S, size=n_pat * plen, dtype=np.uint32)
        gp = np.arange(n_pat, dtype=np.int64)
        buf = np.zeros((-(-n_pat // 8), S), dtype=np.uint8)
        t0 = time.perf_counter()
        native.fill_incidence_bits(gp, offs, sids, buf)
        dt = time.perf_counter() - t0
        res["fill_Bps"] = buf.nbytes / max(dt, 1e-6)
    return res


def calibrate(force: bool = False) -> dict:
    """Run the probes (device ones only when a TPU is attached) and
    write the cache; returns the resolved constants."""
    if not force:
        cached = _load_cache()
        if cached:
            return resolve()
    from .pallas_gram import on_tpu
    data: dict = {"version": _VERSION, "ts": time.time()}
    try:
        data.update(_probe_host())
    except Exception as e:            # never let probes break a run
        data["host_probe_error"] = repr(e)[:200]
    if on_tpu():
        try:
            data.update(_probe_device())
        except Exception as e:
            data["device_probe_error"] = repr(e)[:200]
    p = cache_path()
    try:
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1))
        os.replace(tmp, p)
    except OSError:
        pass
    return resolve()


def ensure_calibrated() -> dict:
    """resolve(), running calibrate() first when a TPU is attached and
    no cache exists yet (the one-time cost is the measure-the-machine
    moment; KMERDB_COST_CALIBRATE=0 disables)."""
    if os.environ.get("KMERDB_COST_CALIBRATE", "1") == "0":
        return resolve()
    if _load_cache() is None:
        from .pallas_gram import on_tpu
        if on_tpu():
            return calibrate()
    return resolve()
