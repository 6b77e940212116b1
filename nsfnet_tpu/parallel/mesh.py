"""Device-mesh data parallelism.

The reference's only parallelism is data parallelism: collocation /
boundary / supervised points sliced per rank with DDP gradient allreduce
over NCCL (ev-NSFnet/pinn_solver.py:142-184, 102-106; train.py:22-43).

TPU-native replacement: a 1-D `jax.sharding.Mesh` over the 'data' axis.
Point batches are padded to a multiple of the mesh size (the reference
gives the last rank the remainder — pinn_solver.py:146-147; padding with
zero-weight rows subsumes that and keeps shapes static) and placed with
NamedSharding(P('data', None)); params/optimizer state are replicated.
The train step is an ordinary jit — XLA inserts the psum for the gradient
and loss reductions, riding ICI within a slice and DCN across slices.
Identical code runs on 1 chip, a v5e pod slice, or an 8-way fake CPU mesh.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed() -> None:
    """Multi-host bring-up (replaces torchrun + NCCL rendezvous,
    ev-NSFnet/train.py:22-43). No-op when not in a multi-host environment."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
        import os

        if "COORDINATOR_ADDRESS" in os.environ or "JAX_COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass  # single-process fallback, mirrors the reference's graceful degrade


def create_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the data axis, features replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def padded_size(n: int, mesh_size: int, lane: int = 8) -> int:
    """Pad row counts to a multiple of mesh_size*lane so each shard is
    sublane-aligned for fp32 TPU tiles."""
    m = mesh_size * lane
    return int(math.ceil(max(n, 1) / m) * m)


def pad_rows(arr: np.ndarray, target_rows: int, fill: float = 0.0) -> np.ndarray:
    """Pad a [N, ...] array with `fill` rows up to target_rows."""
    n = arr.shape[0]
    if n == target_rows:
        return arr
    pad_shape = (target_rows - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


def shard_batch(mesh: Mesh, arr) -> jax.Array:
    """device_put a padded host array with rows sharded over the mesh."""
    return jax.device_put(arr, batch_sharding(mesh))
