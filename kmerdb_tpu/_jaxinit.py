"""Lazy, idempotent JAX import + configuration.

Importing jax costs several seconds of interpreter time; CLI modes
that never touch a device (distance, minhash, host-path queries) must
not pay it.  Every module that needs jax obtains it through
jax_modules(), which applies the project configuration exactly once:

* 64-bit mode — packed k-mers and MurmurHash-style mixing are uint64
  (reference src/types.h kmer_t); must be set before any jnp use.
* persistent compile cache — opt-in via KMERDB_JAX_CACHE.  It is NOT
  on by default: XLA:CPU caches AOT results keyed loosely enough that
  an entry compiled on one machine can SIGILL on another (observed
  "machine features don't match" warnings when a cache directory
  outlives the host), and on tunneled TPU backends the cache does not
  carry across processes anyway.
"""

import os

_configured = False


def jax_modules():
    """Returns (jax, jax.numpy), configured on first call."""
    global _configured
    import jax

    if not _configured:
        jax.config.update("jax_enable_x64", True)
        cache_dir = os.environ.get("KMERDB_JAX_CACHE")
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        _configured = True

    import jax.numpy as jnp
    return jax, jnp
