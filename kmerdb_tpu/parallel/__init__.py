"""Multi-device scaling: meshes, sharded kernels, collectives.

Replaces the reference's intra-node concurrency runtime (src/queue.h
semaphores/queues, active_thread_pool) with jax.sharding meshes and XLA
collectives: pattern-sharded Gram contractions merged by psum play the
role of the per-thread row-ownership partitioning
(similarity_calculator.cpp:371-399), and sample-batch data parallelism
replaces the reader-thread pool (loader_ex.cpp:62-66).
"""
