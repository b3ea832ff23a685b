"""Compiled-on-hardware Pallas kernel checks.

The main suite runs on a forced 8-device virtual CPU backend
(conftest.py), which exercises the Pallas kernels only through the
interpreter.  These tests spawn a clean subprocess WITHOUT the forced
platform so the kernels go through the real Mosaic compiler on the
attached TPU chip — the exact path that was broken in round 1
("failed to legalize func.return" under x64 tracing).  Skipped when no
TPU is attached.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(snippet: str) -> str:
    try:
        r = subprocess.run([sys.executable, "-c", snippet],
                           env=_clean_env(), capture_output=True,
                           text=True, timeout=480)
    except subprocess.TimeoutExpired:
        # the shared compile/transfer service can stall a process's
        # first device pass for many minutes (rig lottery, see
        # ops/device_a2a docs); that is not a kernel failure
        pytest.skip("TPU compile/transfer service stalled (>480 s)")
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr[-2000:]}"
    return r.stdout


_HAS_TPU = None


def _has_tpu() -> bool:
    global _HAS_TPU
    if _HAS_TPU is None:
        try:
            out = _run("from kmerdb_tpu.ops.pallas_gram import on_tpu;"
                       "print('YES' if on_tpu() else 'NO')")
            _HAS_TPU = "YES" in out
        except Exception:
            _HAS_TPU = False
    return _HAS_TPU


@pytest.fixture(autouse=True)
def _require_tpu():
    if not _has_tpu():
        pytest.skip("no TPU attached")


def test_pallas_kernels_compile_on_hardware():
    """gram_u32 / gram_u32_tri / matmul_u32 compiled (interpret=False)
    byte-equal a NumPy integer oracle on the real chip."""
    out = _run("""
import numpy as np
import jax.numpy as jnp
from kmerdb_tpu.ops import pallas_gram as pg
assert pg.on_tpu()
rng = np.random.default_rng(0)
P, S = 2 * pg.KT, 256
B = (rng.random((P, S)) < 0.2).astype(np.int8)
w = rng.integers(1, 16_000_000, size=(P, 1)).astype(np.uint32)
ref = (((B.astype(np.uint64).T * w.ravel().astype(np.uint64)) @
        B.astype(np.uint64)) & 0xFFFFFFFF).astype(np.uint32)
Bj, wj = jnp.asarray(B), jnp.asarray(w)
C = np.asarray(pg.gram_u32(Bj, wj, n_limbs=3, interpret=False))
assert np.array_equal(C, ref), "gram_u32 mismatch"
T = np.asarray(pg.gram_u32_tri(Bj, wj, n_limbs=3, interpret=False))
T = np.tril(T) + np.tril(T, -1).T
assert np.array_equal(T, ref), "gram_u32_tri mismatch"
H = rng.integers(0, 70_000, size=(128, P)).astype(np.uint32)
refM = ((H.astype(np.uint64) @ B.astype(np.uint64))
        & 0xFFFFFFFF).astype(np.uint32)
M = np.asarray(pg.matmul_u32(jnp.asarray(H), Bj, n_limbs=3,
                             interpret=False))
assert np.array_equal(M, refM), "matmul_u32 mismatch"
# packed flagship: in-kernel bit unpack + aliased C accumulation +
# Mosaic tile pull
Bp = np.zeros((P // 8, S), dtype=np.uint8)
for i in range(P):
    Bp[i >> 3] |= (B[i] << np.uint8(i & 7)).astype(np.uint8)
wpk = pg.pk_weight_order(w.ravel()).reshape(-1, 1)
C0 = jnp.zeros((S, S), dtype=jnp.uint32)
Cpk = pg.gram_u32_pk_tri(jnp.asarray(Bp), jnp.asarray(wpk), C0,
                         n_limbs=3, interpret=False)
tiles = np.asarray(pg.tril_tiles(Cpk, interpret=False))
got = pg.untile_symmetric(tiles, S)
assert np.array_equal(got, ref), "gram_u32_pk_tri mismatch"
print("HW_KERNELS_OK")
""")
    assert "HW_KERNELS_OK" in out


def test_device_tiers_agree_on_hardware():
    """all2all XLA tier == Pallas tier == host C++ end-to-end on the
    real chip (the three-tier contract of ops/intersect.py)."""
    out = _run("""
import os
import numpy as np
os.environ["KMERDB_A2A_DEVICE"] = "1"
os.environ["KMERDB_A2A_PALLAS"] = "1"
from kmerdb_tpu.models.database import KmerPatternDb
from kmerdb_tpu.models import builder
from kmerdb_tpu.ops import intersect
rng = np.random.default_rng(1)
samples = [(f"s{i}",
            np.unique(rng.integers(0, 1 << 40, size=2000).astype(np.uint64)))
           for i in range(24)]
db = builder.add_samples(
    KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
    samples)
C_pal = intersect.all2all_counts(db)
os.environ["KMERDB_A2A_PALLAS"] = "0"
C_xla = intersect.all2all_counts(db)
os.environ["KMERDB_A2A_DEVICE"] = "0"
C_host = intersect.all2all_counts(db)
assert np.array_equal(C_pal, C_xla), "pallas != xla"
assert np.array_equal(C_xla, C_host), "xla != host"
print("HW_TIERS_OK")
""")
    assert "HW_TIERS_OK" in out
