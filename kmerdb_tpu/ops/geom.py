"""Gram-kernel geometry: constants + per-machine autotuned tables.

Importable WITHOUT jax/pallas (module import costs ~1.3 s of
jax.experimental.pallas machinery): the tier-dispatch cost models read
tile rates and K-block sizes from here before deciding whether the
device tier engages at all, so a host-bound CLI run never pays the
pallas import just to learn it stays on host.

The s8 tile-rate table and K-block are resolved per machine:
KMERDB_A2A_KT / KMERDB_A2A_TILE env > the costcal calibration cache
(~/.cache/kmerdb_tpu/cost.json, written by the one-time microprobe or
`tools/kernel_sweep.py --on-db --save-cost`) > built-in defaults (the
2026-08-19 on-database sweep of the tunneled v5e rig).  This replaces
the round-4 hardcoded one-rig table (reference role: runtime
measure-the-machine dispatch, src/instr_set_detect.h:26-57).
"""

import os

#: K-block (pattern rows per MXU step) of the bf16 engine; bf16
#: sublane tile is 16, and 2^8 * KT must stay < 2^24 for exact f32
#: accumulation.
KT = 512
#: bf16 output tile edge (MXU native)
TILE = 128

#: int8-engine defaults (kernel_sweep 2026-08-19 on a real 4096-sample
#: database's resident incidence: kt=2048 beats kt=1024 at every tile,
#: kt=4096 exceeds the Mosaic compiler's limits)
KT_S8 = 2048
TILE_S8 = 512

#: weight-limb width per engine (7-bit limbs keep int8 products exact)
LIMB_BITS = {"bf16": 8, "s8": 7}

#: fallback measured isolated-kernel TFLOPS by output tile edge
#: (int8 engine, kt=2048, tunneled v5e, on-db sweep 2026-08-19)
_S8_TILE_TFLOPS_DEFAULT = {128: 70.0, 256: 170.0, 512: 318.0}


def kt_s8() -> int:
    """Effective int8-engine K-block: env > calibration cache > 2048."""
    v = os.environ.get("KMERDB_A2A_KT")
    if v:
        return int(v)
    from . import costcal
    cached = costcal._load_cache()
    if cached and cached.get("s8_kt"):
        return int(cached["s8_kt"])
    return KT_S8


def tile_rates() -> dict[int, float]:
    """Measured isolated-kernel TFLOPS by s8 output tile edge for THIS
    machine (calibration cache key `s8_tile_tflops`), else the
    built-in rig defaults."""
    from . import costcal
    cached = costcal._load_cache()
    if cached and isinstance(cached.get("s8_tile_tflops"), dict):
        try:
            rates = {int(k): float(v)
                     for k, v in cached["s8_tile_tflops"].items()}
            if rates:
                return rates
        except (TypeError, ValueError):
            pass
    return dict(_S8_TILE_TFLOPS_DEFAULT)


def pick_tile(S: int) -> int:
    """Output tile edge maximizing measured rate / padding waste for a
    sample count S (the triangle/rect kernels pad S up to the tile)."""
    best, best_eff = TILE, 0.0
    for t, rate in tile_rates().items():
        s_pad = -(-S // t) * t
        eff = rate / ((s_pad / max(S, 1)) ** 2)
        if eff > best_eff:
            best, best_eff = t, eff
    return best
