"""Device mesh + sharding helpers.

Parallelism map (vs reference, SURVEY #33/#34):
  * training: data-parallel over the batch axis (the reference's only
    distribution is NCCL DDP via Accelerate) — here a 1-D ``Mesh('data')``
    with replicated params; XLA inserts the gradient all-reduce.
  * inference: the long-video pipeline's context windows are embarrassingly
    parallel per denoise step (reference runs them sequentially on one GPU,
    pipeline_pose2vid_long.py:519) — the window-batch axis shards over
    'data' as well.
Multi-host: ``init_distributed()`` (guarded ``jax.distributed.initialize``)
before ``make_mesh`` — the reference's multi-node story is ``accelerate
launch`` DDP over NCCL (README.md:226,243); here one JAX process per host
joins a coordinator and the same 1-D 'data' mesh spans all hosts, with
gradient all-reduce riding ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded multi-host init (DCN path).  Returns True iff a multi-process
    runtime was initialised.

    Resolution order: explicit args > env vars (``JAX_COORDINATOR_ADDRESS``
    / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``, or a TPU-pod environment
    where ``jax.distributed.initialize()`` autodetects everything) > no-op.
    Safe to call unconditionally from every entry point: single-process runs
    (this repo's only testable mode) skip initialisation entirely, and a
    second call on an already-initialised runtime is left alone.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    autodetect = os.environ.get("JAX_MULTIHOST_AUTODETECT", "") == "1"
    if coordinator_address is None and not autodetect:
        return False
    try:
        if autodetect and coordinator_address is None:
            # TPU pod: coordinator/process topology from the pod metadata
            jax.distributed.initialize()
        else:
            env_num = os.environ.get("JAX_NUM_PROCESSES")
            env_pid = os.environ.get("JAX_PROCESS_ID")
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=(
                    num_processes if num_processes is not None
                    else int(env_num) if env_num else None
                ),
                process_id=(
                    process_id if process_id is not None
                    else int(env_pid) if env_pid else None
                ),
            )
    except RuntimeError as e:  # second call on an already-initialised runtime
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


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
    slow on low-core hosts.

    Multi-host (after ``init_distributed``): each process passes its OWN
    slice of the global batch (global_bs / process_count rows, its
    dataloader shard) and the leaves are assembled into global arrays
    without any cross-host data movement."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, x.ndim, axis), np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(
        tree, jax.tree.map(lambda x: data_sharding(mesh, x.ndim, axis), tree)
    )


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_opt_state(state, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-1-style optimizer-state sharding over the data axis — BEYOND
    the reference, whose only distribution is DDP with fully replicated
    optimizer state (SURVEY #33/#34: no ZeRO/FSDP anywhere).

    Each optimizer-state leaf whose leading dim divides the mesh is
    device_put sharded on that dim; the rest (scalars like ``count``, odd
    shapes) replicate.  Under the jitted train step GSPMD keeps the
    moments sharded across steps: the Adam update math is elementwise per
    parameter, so each device updates only its 1/N shard and the only
    collective added is the all-gather of the parameter UPDATE (the same
    wire cost ZeRO-1 pays).  With the 8-bit moments
    (``train/optim8bit.py``: flat int8 + per-block scales, both
    dim-0-shardable) a v5e-8 holds ~0.4 GB of moments per chip for the
    stage-1 trainable set instead of ~3.3 GB per chip replicated.

    Returns ``state`` with ``opt_state`` sharded and everything else
    replicated.
    """
    n = mesh.shape[axis_name]

    def put(x):
        shape = np.shape(x)
        if len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis_name))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    rest = replicate(state._replace(opt_state=None), mesh)
    opt = jax.tree.map(put, state.opt_state)
    return rest._replace(opt_state=opt)
