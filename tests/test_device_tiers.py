"""Device-tier selection and fallback chain for the counting kernels.

The tier logic (ops/intersect.py) mirrors the reference's single CPU
path with hardware dispatch instead: host C++ below the scatter-ops
threshold, XLA limb matmuls as the default device tier, and the fused
Pallas kernels behind KMERDB_A2A_PALLAS=1 with a logged fallback.
These tests pin the env-knob contract (KMERDB_A2A_DEVICE,
KMERDB_N2A_DEVICE, KMERDB_A2A_PALLAS) and prove the Pallas tier's
failure path lands on the XLA result: on the CPU test backend a forced
on_tpu()=True makes pl.pallas_call reject compilation outright, which
must degrade to the XLA tier with a warning, never an error.
"""

import numpy as np

from kmerdb_tpu.models.database import KmerPatternDb
from kmerdb_tpu.models import builder
from kmerdb_tpu.ops import intersect


def _db(n_samples=6, n_kmers=400, seed=0):
    rng = np.random.default_rng(seed)
    db = KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt")
    pool = rng.integers(0, 1 << 36, size=n_kmers, dtype=np.uint64)
    batch = []
    for i in range(n_samples):
        take = rng.random(n_kmers) < rng.uniform(0.2, 0.8)
        batch.append((f"s{i}", np.unique(pool[take])))
    return builder.add_samples(db, batch)


def _host_oracle(db):
    C = np.zeros((db.n_samples, db.n_samples), dtype=np.uint32)
    offs = db.pattern_offsets
    for p in range(db.n_patterns):
        ids = db.pattern_sample_ids[offs[p]:offs[p + 1]]
        w = db.pattern_num_kmers[p]
        for a in range(len(ids)):
            for b in range(len(ids)):
                C[ids[a], ids[b]] += w
    return C


def test_a2a_device_env_forces_xla_tier(monkeypatch):
    db = _db()
    oracle = _host_oracle(db)
    monkeypatch.setenv("KMERDB_A2A_DEVICE", "1")
    np.testing.assert_array_equal(intersect.all2all_counts(db), oracle)
    monkeypatch.setenv("KMERDB_A2A_DEVICE", "0")
    np.testing.assert_array_equal(intersect.all2all_counts(db), oracle)


def test_a2a_pallas_tier_falls_back_on_compile_failure(monkeypatch, capsys):
    """KMERDB_A2A_PALLAS=1 with a backend that cannot compile the kernel
    (CPU posing as TPU) must warn and fall back to the XLA tier."""
    from kmerdb_tpu.ops import pallas_gram
    db = _db(seed=1)
    oracle = _host_oracle(db)
    monkeypatch.setenv("KMERDB_A2A_DEVICE", "1")
    monkeypatch.setenv("KMERDB_A2A_PALLAS", "1")
    monkeypatch.setattr(pallas_gram, "on_tpu", lambda: True)
    np.testing.assert_array_equal(intersect.all2all_counts(db), oracle)
    err = capsys.readouterr().err
    assert "pallas all2all tier" in err and "falling back" in err


def test_n2a_device_env(monkeypatch):
    db = _db(seed=2)
    rng = np.random.default_rng(3)
    queries = [np.unique(rng.integers(0, 1 << 36, size=150,
                                      dtype=np.uint64))
               for _ in range(4)]
    host = intersect.many2all_counts(db, queries, use_device=False)
    monkeypatch.setenv("KMERDB_N2A_DEVICE", "1")
    np.testing.assert_array_equal(
        intersect.many2all_counts(db, queries), host)


def test_d2d_device_env(monkeypatch):
    """KMERDB_D2D_DEVICE=1 contracts pattern-pair chunks on the
    device (C = U^T diag(counts) V); results must equal the host
    cross_apply exactly, including count weights above one limb."""
    dbA = _db(n_samples=5, n_kmers=600, seed=6)
    dbB = _db(n_samples=7, n_kmers=600, seed=6)  # same pool -> overlap
    host = intersect.db2db_counts(dbA, dbB)
    assert host.max() > 0, "test corpus must actually intersect"
    monkeypatch.setenv("KMERDB_D2D_DEVICE", "1")
    # off-TPU the Mosaic tier needs the explicit pallas opt-in (it
    # runs in the interpreter here); without it the env falls back to
    # the host path
    monkeypatch.setenv("KMERDB_A2A_PALLAS", "1")
    np.testing.assert_array_equal(intersect.db2db_counts(dbA, dbB), host)


def test_n2a_pallas_tier_falls_back(monkeypatch, capsys):
    from kmerdb_tpu.ops import pallas_gram
    db = _db(seed=4)
    rng = np.random.default_rng(5)
    queries = [np.unique(rng.integers(0, 1 << 36, size=150,
                                      dtype=np.uint64))
               for _ in range(3)]
    host = intersect.many2all_counts(db, queries, use_device=False)
    monkeypatch.setenv("KMERDB_N2A_DEVICE", "1")
    monkeypatch.setenv("KMERDB_A2A_PALLAS", "1")
    monkeypatch.setattr(pallas_gram, "on_tpu", lambda: True)
    np.testing.assert_array_equal(
        intersect.many2all_counts(db, queries), host)
    err = capsys.readouterr().err
    assert "new2all tier" in err and "falling back" in err


def test_n2a_mosaic_tier_runs_without_fallback(monkeypatch, capsys):
    """The Mosaic new2all tier must actually RUN (interpret mode
    off-TPU) for 1-limb inputs, where m2a_prepare emits uint8 hit
    counts: the executable is lowered with H's real dtype, so no
    'Argument types differ' fallback warning may appear (advisor
    round-2 medium finding)."""
    db = _db(seed=7)
    rng = np.random.default_rng(8)
    queries = [np.unique(rng.integers(0, 1 << 36, size=150,
                                      dtype=np.uint64))
               for _ in range(3)]
    host = intersect.many2all_counts(db, queries, use_device=False)
    H_all, _, n_limbs = intersect.m2a_prepare(db, queries)
    assert n_limbs == 1 and H_all.dtype == np.uint8, \
        "corpus must exercise the u8 hit-count layout"
    monkeypatch.setenv("KMERDB_N2A_DEVICE", "1")
    monkeypatch.setenv("KMERDB_A2A_PALLAS", "1")
    np.testing.assert_array_equal(
        intersect.many2all_counts(db, queries), host)
    err = capsys.readouterr().err
    assert "falling back" not in err
