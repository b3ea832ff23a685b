"""Sharding invariance: N-device pattern-sharded all2all == single-device.

Plays the role of the reference CI's threads-{1,2,16} matrix (results
must not depend on the parallel decomposition)."""

import numpy as np
import pytest

from kmerdb_tpu.io import fasta, ingest
from kmerdb_tpu.models.database import KmerPatternDb
from kmerdb_tpu.models import builder
from kmerdb_tpu.ops import intersect
from kmerdb_tpu.ops.alphabet import get_alphabet
from kmerdb_tpu.parallel.mesh import make_mesh
from kmerdb_tpu.parallel.sharded import all2all_counts_sharded


@pytest.fixture(scope="module")
def synth_db(reference_test_dir):
    path = reference_test_dir / "synth" / "synth.fa"
    headers, seqs = fasta.split_contigs(fasta.read_raw(str(path)))
    alph = get_alphabet("nt")
    samples = [(h.decode(), ingest.extract_sample_kmers([s], 21, alph))
               for h, s in zip(headers, seqs)]
    return builder.add_samples(
        KmerPatternDb(kmer_length=21, fraction=1.0, alphabet_name="nt"),
        samples)


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_all2all_matches(synth_db, n_devices):
    import jax
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_devices)
    got = all2all_counts_sharded(synth_db, mesh)
    want = intersect.all2all_counts(synth_db)
    np.testing.assert_array_equal(got, want)


def test_many2all_sharded_matches_single():
    """Query-sharded batched new2all == single-device host path."""
    from kmerdb_tpu.parallel.sharded import many2all_counts_sharded
    from kmerdb_tpu.utils import native
    if not native.available:
        pytest.skip("no native lib")
    mesh8 = make_mesh(8)

    rng = np.random.default_rng(23)
    pool = rng.integers(0, 1 << 40, size=4000, dtype=np.uint64)
    samples = [(f"s{i}", np.unique(rng.choice(
        pool, size=rng.integers(100, 700), replace=False)))
        for i in range(6)]
    db = builder.add_samples(
        KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
        samples)
    queries = [np.unique(rng.choice(pool, size=rng.integers(50, 400),
                                    replace=False)) for _ in range(11)]
    single = intersect.many2all_counts(db, queries, use_device=False)
    sharded = many2all_counts_sharded(db, queries, mesh8)
    np.testing.assert_array_equal(sharded, single)


def test_db2db_sharded_matches_single():
    """Pattern-pair-sharded cross-DB counts == host cross_apply."""
    from kmerdb_tpu.parallel.sharded import db2db_counts_sharded
    from kmerdb_tpu.utils import native
    if not native.available:
        pytest.skip("no native lib")
    mesh8 = make_mesh(8)

    rng = np.random.default_rng(29)
    pool = rng.integers(0, 1 << 40, size=3000, dtype=np.uint64)

    def mk(n, seed):
        r = np.random.default_rng(seed)
        return builder.add_samples(
            KmerPatternDb(kmer_length=18, fraction=1.0,
                          alphabet_name="nt"),
            [(f"s{i}", np.unique(pool[r.random(pool.size)
                                      < r.uniform(0.2, 0.7)]))
             for i in range(n)])

    dbA, dbB = mk(5, 1), mk(9, 2)
    host = intersect.db2db_counts(dbA, dbB)
    assert host.max() > 0
    np.testing.assert_array_equal(
        db2db_counts_sharded(dbA, dbB, mesh8), host)
