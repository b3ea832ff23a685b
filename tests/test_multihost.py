"""Multi-process (multi-host analogue) sharded execution.

Two CPU processes x 4 virtual devices join one jax.distributed
runtime; the pattern-sharded all2all runs over the global 8-device
mesh with host-sharded incidence assembly, and both processes check
byte equality against the single-host kernel (SURVEY §5 "Distributed
communication backend", the reference has no multi-node path at all).
"""

import os
import sys

import pytest


def test_two_process_sharded_all2all():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    try:
        g.dryrun_multihost(n_processes=2, devices_per_proc=4,
                           timeout_s=280)
    except RuntimeError as e:
        if "UNAVAILABLE" in str(e) or "deadline" in str(e).lower():
            pytest.skip(f"distributed runtime unavailable: {e}")
        raise
