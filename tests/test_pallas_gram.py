"""Pallas weighted-Gram kernel vs the XLA limb decomposition and a
pure-integer NumPy oracle (tests run on the CPU backend; the kernel is
exercised in interpreter mode, which shares all kernel code with the
compiled TPU path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmerdb_tpu.ops import pallas_gram


def _numpy_oracle(B, w):
    Bi = B.astype(np.uint64)
    C = (Bi * w[:, None]).T @ Bi
    return (C & 0xFFFFFFFF).astype(np.uint32)


@pytest.mark.parametrize("P,S,wmax,seed", [
    (pallas_gram.KT, 128, 200, 0),
    (2 * pallas_gram.KT, 256, 70_000, 1),
    (3 * pallas_gram.KT, 128, 16_000_000, 2),
])
def test_gram_matches_oracle(P, S, wmax, seed):
    rng = np.random.default_rng(seed)
    B = (rng.random((P, S)) < 0.1).astype(np.int8)
    w = rng.integers(0, wmax, size=P).astype(np.uint32)
    n_limbs = max(1, (int(w.max()).bit_length() + 7) // 8)

    expect = _numpy_oracle(B, w)

    Bj = jnp.asarray(B)
    wj = jnp.asarray(w).reshape(-1, 1)
    got = np.asarray(pallas_gram.gram_u32(Bj, wj, n_limbs=n_limbs))
    np.testing.assert_array_equal(got, expect)

    ref = np.asarray(pallas_gram.gram_u32_reference(
        Bj, jnp.asarray(w), n_limbs=n_limbs))
    np.testing.assert_array_equal(ref, expect)


def test_pallas_scan_path_matches_xla():
    """all2all through _a2a_scan(use_pallas=True, interpret) equals the
    XLA chunk path on a small random database."""
    from kmerdb_tpu.models.database import KmerPatternDb
    from kmerdb_tpu.models import builder
    from kmerdb_tpu.ops import intersect

    rng = np.random.default_rng(7)
    samples = []
    pool = rng.integers(0, 1 << 40, size=3000, dtype=np.uint64)
    for i in range(10):
        ks = rng.choice(pool, size=rng.integers(100, 800), replace=False)
        samples.append((f"s{i}", np.unique(ks)))
    db = builder.add_samples(
        KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
        samples)

    C_xla = intersect.all2all_counts(db)

    # force the pallas route (on the CPU test backend gram_u32
    # self-selects interpreter mode)
    from test_a2a_paths import _device_a2a
    C_pl = _device_a2a(db, chunk=pallas_gram.KT, use_pallas=True)
    np.testing.assert_array_equal(C_pl, C_xla)


def test_many2all_device_matches_host():
    """Batched new2all (sims = H @ B on pattern chunks) equals the
    per-query host path; the pallas matmul kernel runs in interpreter
    mode on the CPU backend."""
    from kmerdb_tpu.models.database import KmerPatternDb
    from kmerdb_tpu.models import builder
    from kmerdb_tpu.ops import intersect
    from kmerdb_tpu.utils import native

    if not native.available:
        pytest.skip("no native lib")

    rng = np.random.default_rng(17)
    pool = rng.integers(0, 1 << 40, size=5000, dtype=np.uint64)
    samples = []
    for i in range(9):
        ks = rng.choice(pool, size=rng.integers(200, 1200), replace=False)
        samples.append((f"s{i}", np.unique(ks)))
    db = builder.add_samples(
        KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
        samples)

    queries = []
    for _ in range(7):
        q = rng.choice(pool, size=rng.integers(50, 900), replace=False)
        # mix in k-mers absent from the database
        q = np.concatenate([q, rng.integers(1 << 41, 1 << 42,
                                            size=20, dtype=np.uint64)])
        queries.append(np.unique(q))
    queries.append(np.empty(0, dtype=np.uint64))  # empty query row

    host = intersect.many2all_counts(db, queries, use_device=False)
    dev = intersect.many2all_counts(db, queries, use_device=True)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("S,seed", [(128, 3), (384, 4)])
def test_gram_tri_matches_full(S, seed):
    """Triangle-grid Gram == full-grid Gram after symmetric
    reconstruction (multiple tile rows exercises the t -> (i, j)
    index decoding)."""
    rng = np.random.default_rng(seed)
    P = 2 * pallas_gram.KT
    B = (rng.random((P, S)) < 0.1).astype(np.int8)
    w = rng.integers(0, 70_000, size=P).astype(np.uint32)

    full = np.asarray(pallas_gram.gram_u32(
        jnp.asarray(B), jnp.asarray(w).reshape(-1, 1), n_limbs=3))
    tri = np.asarray(pallas_gram.gram_u32_tri(
        jnp.asarray(B), jnp.asarray(w).reshape(-1, 1), n_limbs=3))
    rec = np.tril(tri) + np.tril(tri, -1).T
    np.testing.assert_array_equal(rec, full)
