"""kmerdb_tpu — a TPU-native k-mer analysis engine.

A from-scratch re-design of the capabilities of refresh-bio/kmer-db
(reference: /root/reference, v2.3.1) for TPU hardware:

* k-mer extraction / minhash filtering as vectorized JAX ops
  (reference: src/kmer_extract.h, src/filter.h),
* the k-mer -> sample-set-pattern database as HBM-resident sorted
  k-mer arrays plus dense pattern/incidence tensors
  (replacing src/prefix_kmer_db.{h,cpp} hashtables + Elias-gamma
  pattern forest),
* common-k-mer counting (all2all / new2all / one2all) as weighted
  Gram-matrix contractions on the MXU
  (replacing src/similarity_calculator.cpp + src/simd/row_add*),
* multi-chip scaling via jax.sharding meshes and psum collectives
  (replacing thread pools / queues in src/queue.h).

The algebraic core: each *pattern* p (a distinct set of samples
sharing some k-mers) with w_p k-mers contributes
``w_p * outer(b_p, b_p)`` to the common-k-mer count matrix, where
b_p is the 0/1 incidence vector over samples.  Hence

    C = B^T diag(w) B

which maps directly onto TPU matrix units.
"""

import os

import jax

# 64-bit mode is required: packed k-mers and MurmurHash-style mixing are
# uint64 (reference: src/types.h kmer_t).  Must happen before any jnp use.
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: CLI invocations are short-lived processes;
# recompiling the counting kernels every run would dominate wall-clock.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("KMERDB_JAX_CACHE", "/tmp/kmerdb_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"
