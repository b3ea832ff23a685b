"""Mesh construction helpers.

Axes:
* "shard" — the pattern/k-mer axis: the database's pattern chunks (and,
  during build, the k-mer key space) are partitioned across devices;
  partial count matrices merge with psum over ICI.
* (future, multi-host) an outer "host" axis for sample-batch data
  parallelism during ingest.
"""

import numpy as np

from .._jaxinit import jax_modules

jax, _ = jax_modules()  # configures x64 + compile cache
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))
