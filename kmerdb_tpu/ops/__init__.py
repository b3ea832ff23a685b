"""Device-side compute ops (JAX/XLA; Pallas kernels where it pays off)."""
