"""One process of the multi-host dryrun (launched by
__graft_entry__.dryrun_multihost / tests/test_multihost.py).

Usage: python tools/multihost_worker.py <proc_id> <n_procs> \
           <devices_per_proc> <port>

Each process owns `devices_per_proc` virtual CPU devices; the
processes join one jax.distributed runtime (the DCN analogue of a
multi-host TPU pod) and run the pattern-sharded all2all over the
GLOBAL mesh: every process fills the incidence rows of its own device
slice, host-local shards are assembled into a global array, and the
psum rides the full mesh.  Process 0 checks the replicated result
against the single-host reference kernel, byte for byte.
"""

import os
import sys


def main():
    pid, nproc, ndev, port = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    os.environ["KMERDB_COORD"] = f"127.0.0.1:{port}"
    os.environ["KMERDB_NUM_PROCS"] = str(nproc)
    os.environ["KMERDB_PROC_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)

    import numpy as np
    from kmerdb_tpu.parallel.mesh import init_distributed
    assert init_distributed(), "KMERDB_COORD must select multi-process"
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from kmerdb_tpu.models.database import KmerPatternDb
    from kmerdb_tpu.models import builder
    from kmerdb_tpu.ops import intersect
    from kmerdb_tpu.parallel import sharded

    # identical deterministic database in every process
    rng = np.random.default_rng(11)
    pool = rng.integers(0, 1 << 40, size=4000, dtype=np.uint64)
    samples = []
    for i in range(3 * nproc * ndev + 1):
        ks = rng.choice(pool, size=int(rng.integers(100, 900)),
                        replace=False)
        samples.append((f"s{i}", np.unique(ks)))
    db = builder.add_samples(
        KmerPatternDb(kmer_length=18, fraction=1.0, alphabet_name="nt"),
        samples)

    D = nproc * ndev
    mesh = Mesh(np.array(jax.devices()).reshape(D), ("shard",))

    # per-device pattern slices, same layout as all2all_counts_sharded
    S = db.n_samples
    offs = db.pattern_offsets
    el_pid = db.element_pattern_ids()
    sids = db.pattern_sample_ids
    w = db.pattern_num_kmers
    n_limbs = max(1, (int(w.max()).bit_length() + 7) // 8)
    per_dev = (db.n_patterns + D - 1) // D
    bounds = [min(db.n_patterns, d * per_dev) for d in range(D + 1)]

    # build ONLY this process's device rows (host-sharded ingest of
    # the incidence: each host touches 1/nproc of the data)
    local_devs = range(pid * ndev, (pid + 1) * ndev)
    B_loc = np.zeros((ndev, per_dev, S), dtype=np.int8)
    w_loc = np.zeros((ndev, per_dev), dtype=np.uint32)
    for li, d in enumerate(local_devs):
        p0, p1 = bounds[d], bounds[d + 1]
        lo, hi = int(offs[p0]), int(offs[p1])
        B_loc[li][(el_pid[lo:hi] - p0).astype(np.int64),
                  sids[lo:hi].astype(np.int64)] = 1
        w_loc[li, :p1 - p0] = w[p0:p1]

    from jax.experimental import multihost_utils
    B_g = multihost_utils.host_local_array_to_global_array(
        B_loc, mesh, P("shard"))
    w_g = multihost_utils.host_local_array_to_global_array(
        w_loc, mesh, P("shard"))

    C = sharded._a2a_sharded(B_g, w_g, mesh=mesh, n_limbs=n_limbs)
    C_local = np.asarray(C.addressable_data(0))

    C_ref = intersect.all2all_counts(db)
    np.testing.assert_array_equal(C_local, C_ref)
    if pid == 0:
        print(f"MULTIHOST_OK procs={nproc} devs={D} "
              f"S={S} P={db.n_patterns}", flush=True)


if __name__ == "__main__":
    main()
