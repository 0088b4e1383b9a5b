"""Device mesh helpers.

The reference scales by pthread fan-out over shared memory
(kthread.cpp kt_for); the TPU-native equivalents are a 1-D ``data`` mesh
for read/window batches (per-read workers) and a ``bucket`` axis for the
sharded minimizer index (the 4096-way low-bit bucketing of htab.cpp:118
maps directly onto device shards).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
