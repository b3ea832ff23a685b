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


@pytest.mark.parametrize("S,rows,wmax,seed", [
    (100, 2 * pallas_gram.KT, 250, 11),        # light class, ragged S
    (300, pallas_gram.KT, 16_000_000, 12),     # heavy limbs, 3 tile rows
])
def test_packed_gram_pk_tri(S, rows, wmax, seed):
    """Packed-bit triangle Gram kernel (in-kernel unpack + C
    accumulation via aliasing) == NumPy oracle, through tril_tiles /
    untile_symmetric reconstruction."""
    import jax
    rng = np.random.default_rng(seed)
    S_pad = -(-S // pallas_gram.TILE) * pallas_gram.TILE
    B = np.zeros((rows, S_pad), dtype=np.uint8)
    B[:, :S] = (rng.random((rows, S)) < 0.2).astype(np.uint8)
    w = rng.integers(0, wmax, size=rows).astype(np.uint32)
    n_limbs = max(1, (int(w.max()).bit_length() + 7) // 8)

    expect = ((B.astype(np.uint64).T * w.astype(np.uint64)) @
              B.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)[:S, :S]

    # pattern-axis packing: bit i & 7 of byte row i >> 3
    Bp = np.zeros((rows // 8, S_pad), dtype=np.uint8)
    for i in range(rows):
        Bp[i >> 3] |= B[i] << np.uint8(i & 7)
    wpk = pallas_gram.pk_weight_order(w).reshape(-1, 1)

    C0 = jnp.zeros((S_pad, S_pad), dtype=jnp.uint32)
    C = pallas_gram.gram_u32_pk_tri(jnp.asarray(Bp), jnp.asarray(wpk),
                                    C0, n_limbs=n_limbs)
    # run twice: C accumulates in place (aliased buffer)
    C = pallas_gram.gram_u32_pk_tri(jnp.asarray(Bp), jnp.asarray(wpk),
                                    C, n_limbs=n_limbs)
    tiles = np.asarray(pallas_gram.tril_tiles(C))
    got = pallas_gram.untile_symmetric(tiles, S)
    np.testing.assert_array_equal(got, 2 * expect.astype(np.uint64)
                                  .astype(np.uint32))


@pytest.mark.parametrize("S,rows,wmax,kt,tile,seed", [
    (100, 2 * 512, 120, 512, 128, 21),        # 1-limb light class
    (300, 1024, 16_000_000, 512, 128, 22),    # 4x 7-bit limbs
    (520, 2048, 120, 1024, 512, 23),          # tuned TPU geometry
])
def test_packed_gram_pk_tri_s8(S, rows, wmax, kt, tile, seed):
    """int8-engine triangle Gram (7-bit limbs, int8 MXU dots) == NumPy
    oracle — the round-3 production engine (219 TFLOPS on the v5e vs 9
    for the bf16 body at the round-2 geometry)."""
    rng = np.random.default_rng(seed)
    S_pad = -(-S // tile) * tile
    B = np.zeros((rows, S_pad), dtype=np.uint8)
    B[:, :S] = (rng.random((rows, S)) < 0.2).astype(np.uint8)
    w = rng.integers(0, wmax, size=rows).astype(np.uint32)
    n_limbs = max(1, -(-int(w.max()).bit_length() // 7))

    expect = ((B.astype(np.uint64).T * w.astype(np.uint64)) @
              B.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)[:S, :S]

    Bp = np.zeros((rows // 8, S_pad), dtype=np.uint8)
    for i in range(rows):
        Bp[i >> 3] |= B[i] << np.uint8(i & 7)
    wpk = pallas_gram.pk_weight_order(w, kt).reshape(-1, 1)

    C0 = jnp.zeros((S_pad, S_pad), dtype=jnp.uint32)
    C = pallas_gram.gram_u32_pk_tri(jnp.asarray(Bp), jnp.asarray(wpk),
                                    C0, n_limbs=n_limbs, kt=kt,
                                    tile=tile, engine="s8")
    C = pallas_gram.gram_u32_pk_tri(jnp.asarray(Bp), jnp.asarray(wpk),
                                    C, n_limbs=n_limbs, kt=kt,
                                    tile=tile, engine="s8")
    got = np.asarray(C)
    # rebuild the symmetric matrix from the computed lower tile
    # triangle (tile-granular: diagonal tiles are full)
    nt = S_pad // tile
    full = np.empty_like(got)
    for it in range(nt):
        for jt in range(it + 1):
            blk = got[it * tile:(it + 1) * tile,
                      jt * tile:(jt + 1) * tile]
            full[it * tile:(it + 1) * tile,
                 jt * tile:(jt + 1) * tile] = blk
            if it != jt:
                full[jt * tile:(jt + 1) * tile,
                     it * tile:(it + 1) * tile] = blk.T
    np.testing.assert_array_equal(
        full[:S, :S], 2 * expect.astype(np.uint64).astype(np.uint32))


@pytest.mark.parametrize("engine,kt,tile", [
    ("bf16", 512, 128), ("s8", 512, 128), ("s8", 1024, 256)])
def test_packed_gram_pk_rows_engines(engine, kt, tile):
    """Row-stripe rectangle Gram matches the oracle rows under both
    engines and non-default geometry (stripe tiles count in units of
    the kernel tile)."""
    rng = np.random.default_rng(31)
    S = 3 * tile
    rows = 2 * kt
    B = (rng.random((rows, S)) < 0.15).astype(np.uint8)
    w = rng.integers(0, 200_000, size=rows).astype(np.uint32)
    bits = int(w.max()).bit_length()
    n_limbs = max(1, -(-bits // pallas_gram.LIMB_BITS[engine]))

    expect = ((B.astype(np.uint64).T * w.astype(np.uint64)) @
              B.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)

    Bp = np.zeros((rows // 8, S), dtype=np.uint8)
    for i in range(rows):
        Bp[i >> 3] |= B[i] << np.uint8(i & 7)
    wpk = pallas_gram.pk_weight_order(w, kt).reshape(-1, 1)

    stripe = jnp.zeros((tile, S), dtype=jnp.uint32)
    out = pallas_gram.gram_u32_pk_rows(
        jnp.asarray(Bp), jnp.asarray(wpk), stripe, 1, n_limbs=n_limbs,
        kt=kt, tile=tile, engine=engine)
    np.testing.assert_array_equal(np.asarray(out),
                                  expect[tile:2 * tile, :])


@pytest.mark.parametrize("engine,kt,tile", [
    ("bf16", 512, 128), ("s8", 512, 128)])
def test_cross_pk_engines(engine, kt, tile):
    """Packed cross-database contraction under both engines."""
    rng = np.random.default_rng(37)
    S1, S2 = 2 * tile, tile
    rows = kt
    U = (rng.random((rows, S1)) < 0.2).astype(np.uint8)
    V = (rng.random((rows, S2)) < 0.2).astype(np.uint8)
    w = rng.integers(0, 60_000, size=rows).astype(np.uint32)
    bits = int(w.max()).bit_length()
    n_limbs = max(1, -(-bits // pallas_gram.LIMB_BITS[engine]))

    expect = ((U.astype(np.uint64).T * w.astype(np.uint64)) @
              V.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)

    def pack(M):
        Mp = np.zeros((rows // 8, M.shape[1]), dtype=np.uint8)
        for i in range(rows):
            Mp[i >> 3] |= M[i] << np.uint8(i & 7)
        return Mp

    wpk = pallas_gram.pk_weight_order(w, kt).reshape(-1, 1)
    C = pallas_gram.cross_u32_pk(
        jnp.asarray(pack(U)), jnp.asarray(pack(V)), jnp.asarray(wpk),
        jnp.zeros((S1, S2), jnp.uint32), n_limbs=n_limbs, kt=kt,
        tile=tile, engine=engine)
    np.testing.assert_array_equal(np.asarray(C), expect)


def test_pick_tile():
    """pick_tile trades measured tile rate against padding waste."""
    assert pallas_gram.pick_tile(4096) == 512
    assert pallas_gram.pick_tile(2048) == 512
    # S=136: tile 512 pads 3.8x (rate 219/14.2 eff) vs tile 256
    # padding 1.9x (120/3.5 -> 33.8 eff) vs 128 at 1.0 eff 28 - > 256
    assert pallas_gram.pick_tile(136) == 256
    assert pallas_gram.pick_tile(1) in (128, 256, 512)


def test_all2all_device_packed_matches_host():
    """device_a2a.all2all_device (packed streaming tier) == host path,
    covering both limb classes and multiple groups."""
    import os
    from kmerdb_tpu.models.database import KmerPatternDb
    from kmerdb_tpu.models import builder
    from kmerdb_tpu.ops import intersect, device_a2a

    rng = np.random.default_rng(23)
    samples = []
    for i in range(40):
        small = rng.choice(4000, size=300, replace=False).astype(np.uint64)
        big = rng.integers(1 << 20, 1 << 36,
                           size=rng.integers(300, 2000)).astype(np.uint64)
        samples.append((f"s{i}", np.unique(np.concatenate([small, big]))))
    db = builder.add_samples(
        KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
        samples)

    host = intersect.all2all_counts(db)
    os.environ["KMERDB_A2A_GROUP_MB"] = "1"   # force multiple groups
    try:
        dev = device_a2a.all2all_device(db)
    finally:
        del os.environ["KMERDB_A2A_GROUP_MB"]
    np.testing.assert_array_equal(dev, host)
    st = device_a2a.last_stats
    assert st["light_patterns"] > 0 and st["heavy_patterns"] > 0
