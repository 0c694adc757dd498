"""Device mesh helpers.

The reference's multi-accelerator story is two FPGA IP cores driven by two
host threads with a statically halved candidate list
(``loop_detector_fpga_parallel.cpp:32-68``).  The TPU generalization is a
1-D ``candidates`` mesh axis over all chips of a slice (ICI), optionally
folded with a host axis for multi-host (DCN) runs: loop candidates and
pose-graph edges shard over it; pose solutions are psum/all-gather
replicated.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS_CANDIDATES = "c"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS_CANDIDATES,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
