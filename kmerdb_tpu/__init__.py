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

# jax is imported lazily (kmerdb_tpu/_jaxinit.py): CLI modes that never
# touch a device (distance, minhash, host-path queries) skip the
# multi-second jax import entirely.

__version__ = "0.3.0"
