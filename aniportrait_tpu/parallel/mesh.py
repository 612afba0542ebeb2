"""Device mesh + sharding helpers.

Parallelism map (vs reference, SURVEY #33/#34):
  * training: data-parallel over the batch axis (the reference's only
    distribution is NCCL DDP via Accelerate) — here a 1-D ``Mesh('data')``
    with replicated params; XLA inserts the gradient all-reduce.
  * inference: the long-video pipeline's context windows are embarrassingly
    parallel per denoise step (reference runs them sequentially on one GPU,
    pipeline_pose2vid_long.py:519) — the window-batch axis shards over
    'data' as well.
Multi-host: call ``jax.distributed.initialize`` before ``make_mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(tree, mesh: Mesh, axis: int = 0):
    """Shard every leaf's ``axis`` over the 'data' mesh axis.

    One ``device_put`` call for the whole tree (a tree of shardings), not one
    per leaf — per-leaf dispatch across many virtual devices is pathologically
    slow on low-core hosts."""
    return jax.device_put(
        tree, jax.tree.map(lambda x: data_sharding(mesh, x.ndim, axis), tree)
    )


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
