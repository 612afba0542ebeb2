"""GSPMD/Shardy partitioning for the Pallas attention kernels.

Under ``jit`` + sharding, a Pallas kernel is a custom call the SPMD
partitioner cannot see into: absent other information it REPLICATES the
call — every device would compute the full global batch, erasing the
mesh speedup exactly where the FLOPs are.  (Reference role: the xformers
CUDA kernels that NCCL DDP composes over, reference
``src/models/attention.py:605-722`` + ``train_stage_1.py:342-349``; here
the kernels must instead compose with the ``jax.sharding`` meshes the
pipelines and trainers use — window rows for the exact long-clip path,
CFG x frame blocks for the fused whole-clip path, the batch axis for DP
training.)

This module provides :func:`make_partitioned`, which wraps a kernel
dispatch function in :class:`jax.experimental.custom_partitioning` with a
batch-dims-only Shardy sharding rule:

* the independent row axes (batch rows / windows / CFG x frame blocks /
  packed tiles) may shard across the mesh;
* sequence, channel and head axes are forced replicated
  (``need_replication_factors``) — attention needs every KV token of its
  own row, and the kernels' block grids already tile those axes on-chip;
* the per-shard lowering re-invokes the SAME kernel on the local shard
  (local shapes are static at partition time, so every shape-derived
  block plan inside the kernel dispatch specialises per shard for free).

``custom_partitioning`` has no differentiation rule, so these wrappers
sit INSIDE the kernels' ``custom_vjp`` boundaries: the primal, the
saving forward and the backward each partition separately (see
``pallas_attention.py``).

Gating: ``partition_enabled()`` turns the wrappers into plain calls on a
single device.  The custom-call machinery invokes Python callbacks
during XLA's SPMD passes; on one chip it buys nothing, so "auto" only
engages when >1 device is visible (the CPU virtual mesh in tests and the
driver dryrun, or a real multi-chip slice).  ``ANIPORTRAIT_KERNEL_
PARTITION=1|0`` forces it either way (read at trace time).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


# test observability: local (per-shard) operand shapes the most recent
# partition lowering of each wrapped kernel was traced with — proves the
# kernel ran on shards, not replicated full operands
LOWER_SHAPES: dict = {}


def partition_enabled() -> bool:
    v = os.environ.get("ANIPORTRAIT_KERNEL_PARTITION", "auto")
    if v == "auto":
        return jax.device_count() > 1
    return v not in ("0", "off", "false", "no")


def axes_of(sharding, dim: int, mesh=None, ndim: int = None) -> tuple:
    """Mesh axis names a sharding uses on ``dim`` (flattened tuple).

    Accepts NamedSharding directly, and raw GSPMD/Hlo shardings (the
    callbacks run with ``decode_shardings=False``: jax's own greedy
    HloSharding->NamedSharding conversion RAISES on tilings whose device
    factorisation does not follow mesh-axis order, e.g. a frames-major
    tile on a (cfg, frames) mesh — propagation can legally produce those,
    and an undecodable sharding must degrade to replication, not crash
    the compile)."""
    spec = None
    if isinstance(sharding, NamedSharding):
        spec = sharding.spec
    elif mesh is not None and hasattr(sharding, "_to_xla_hlo_sharding"):
        try:
            from jax._src.sharding_impls import parse_flatten_op_sharding

            # returns PartitionSpec directly (newer jax) or a Parsed
            # wrapper with .get_partition_spec() (older)
            parsed = parse_flatten_op_sharding(
                sharding._to_xla_hlo_sharding(ndim), mesh
            )[0]
            spec = (
                parsed.get_partition_spec()
                if hasattr(parsed, "get_partition_spec")
                else parsed
            )
        except Exception:
            return ()
    if spec is None or dim >= len(spec):
        return ()
    entry = spec[dim]
    if entry is None:
        return ()
    if isinstance(entry, (tuple, list)):
        return tuple(entry)
    return (entry,)


def prod_axes(mesh, axes: Sequence) -> int:
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def nd_spec(ndim: int, dim_axes: dict) -> PartitionSpec:
    """PartitionSpec with ``dim_axes[dim]`` (tuple of mesh axes) on the
    listed dims and replication elsewhere."""
    entries = []
    for i in range(ndim):
        ax = tuple(dim_axes.get(i, ()))
        entries.append(None if not ax else (ax[0] if len(ax) == 1 else ax))
    return PartitionSpec(*entries)


def default_sanitize(batch_dims, out_batch_dims, bank_ops=(), bank_dim=0):
    """Build a sanitize callback for the common case: every operand/result
    shards along one designated batch dim with the spec taken from operand
    0's batch dim, everything else replicated.

    ``bank_ops``: operand indices whose ``bank_dim`` extent is an integer
    divisor of operand 0's batch extent (``rep`` consecutive rows of
    operand 0 share one bank row, bank-major order).  Those operands get
    the longest PREFIX of operand 0's batch axes whose size divides the
    bank extent — the suffix axes then split the ``rep`` groups, which
    must divide evenly; otherwise everything falls back to replication
    (correct, just not parallel).
    """

    def sanitize(mesh, arg_shapes, result_shapes, statics):
        q = arg_shapes[0]
        qb = batch_dims[0]
        axes = axes_of(q.sharding, qb, mesh, len(q.shape))
        b = q.shape[qb]
        if axes and b % prod_axes(mesh, axes) != 0:
            axes = ()  # uneven split: replicate rather than risk padding

        def bank_prefix(extent: int):
            rep = b // extent if extent else 1
            pre = []
            n = 1
            for a in axes:
                sz = mesh.shape[a]
                if extent % (n * sz) == 0:
                    pre.append(a)
                    n *= sz
                else:
                    break
            rest = prod_axes(mesh, axes[len(pre):])
            if extent % max(n, 1) != 0 or rep % rest != 0:
                return None  # inconsistent: force full replication
            return tuple(pre)

        arg_shardings = []
        for i, s in enumerate(arg_shapes):
            bd = bank_dim if i in bank_ops else batch_dims[i]
            if i in bank_ops:
                ax = bank_prefix(s.shape[bd])
                if ax is None:
                    return None  # caller replicates everything
            else:
                ax = axes
            arg_shardings.append(
                NamedSharding(mesh, nd_spec(len(s.shape), {bd: ax}))
            )
        out_shardings = [
            NamedSharding(mesh, nd_spec(len(r.shape), {bd: axes}))
            for r, bd in zip(result_shapes, out_batch_dims)
        ]
        return arg_shardings, out_shardings

    return sanitize


def make_partitioned(
    name: str,
    impl: Callable,
    rule,
    *,
    n_static: int,
    need_replication: Sequence[str] = (),
    batch_dims: Sequence[int] = (),
    out_batch_dims: Sequence[int] = (0,),
    bank_ops: Sequence[int] = (),
    bank_dim: int = 0,
    factor_sizes_fn: Callable | None = None,
    sanitize: Callable | None = None,
):
    """Wrap ``impl(*dyn_args, *static_args)`` in custom_partitioning.

    Args:
      impl: the kernel dispatch.  It must derive every shape-dependent
        quantity (padding plans, ``rep`` group sizes, packing factors)
        from its operand SHAPES, because inside the mesh it runs on local
        shards.  Static args are appended after the dynamic operands.
      rule: Shardy einsum-like rule over the DYNAMIC args, e.g.
        ``'b s c, b t c, b t c -> b s c'``.  Compound factors
        (``'(n r) s c'``) express bank/packed groupings.  May be a
        callable ``(dyn_shapes, *static_args) -> (rule_str, factor_sizes
        dict)`` for shapes where the rule degenerates (Shardy rejects
        compound factors containing a size-1 factor).
      n_static: number of trailing static args.
      need_replication: factor names that must never shard.
      batch_dims / out_batch_dims / bank_ops / bank_dim: see
        :func:`default_sanitize` (ignored when ``sanitize`` is given).
      factor_sizes_fn: ``(dyn_shapes, *static_args) -> dict`` of factor
        sizes that only appear inside compound factors (e.g.
        ``{'r': rep}``); a distinct custom_partitioning instance is
        cached per value.
      sanitize: optional override ``(mesh, arg_shapes, result_shapes,
        statics) -> (arg_shardings, out_shardings) | None`` (None =
        replicate everything).

    Returns a callable with ``impl``'s signature that dispatches through
    the partitioned op when :func:`partition_enabled` and multiple
    devices may be involved, else calls ``impl`` directly.
    """
    assert batch_dims, "batch_dims must list one entry per dynamic operand"
    n_dyn = len(batch_dims)
    san = sanitize or default_sanitize(
        batch_dims, out_batch_dims, bank_ops, bank_dim
    )
    static_argnums = tuple(range(n_dyn, n_dyn + n_static))
    cache: dict = {}

    def _build(rule_str, fs_key):
        # Shardy indexes factors by first appearance in the rule and
        # requires the special-factor lists sorted by that index; factors
        # absent from a degenerate rule variant are dropped
        order = []
        for tok in rule_str.replace("(", " ").replace(")", " ").replace(
                ",", " ").replace("->", " ").split():
            if tok not in order:
                order.append(tok)
        repl = tuple(sorted(
            (f for f in need_replication if f in order), key=order.index
        ))
        cp = custom_partitioning(impl, static_argnums=static_argnums)

        def partition(*a):
            statics = a[:-3]
            mesh, arg_shapes, result_shape = a[-3:]
            result_shapes = jax.tree.leaves(
                result_shape, is_leaf=lambda x: hasattr(x, "shape")
            )
            picked = san(mesh, tuple(arg_shapes), result_shapes, statics)
            if picked is None:
                repl = NamedSharding(mesh, PartitionSpec())
                arg_shardings = tuple(repl for _ in arg_shapes)
                out_leaf_shardings = [repl for _ in result_shapes]
            else:
                arg_shardings, out_leaf_shardings = picked
                arg_shardings = tuple(arg_shardings)
            out_shardings = jax.tree.unflatten(
                jax.tree.structure(
                    result_shape, is_leaf=lambda x: hasattr(x, "shape")
                ),
                out_leaf_shardings,
            )

            def lower_fn(*dyn):
                LOWER_SHAPES[name] = tuple(tuple(x.shape) for x in dyn)
                return impl(*dyn, *statics)

            return mesh, lower_fn, out_shardings, arg_shardings

        def infer(*a):
            statics = a[:-3]
            mesh, arg_shapes, result_shape = a[-3:]
            result_shapes = jax.tree.leaves(
                result_shape, is_leaf=lambda x: hasattr(x, "shape")
            )
            picked = san(mesh, tuple(arg_shapes), result_shapes, statics)
            if picked is None:
                leafs = [
                    NamedSharding(mesh, PartitionSpec())
                    for _ in result_shapes
                ]
            else:
                leafs = picked[1]
            return jax.tree.unflatten(
                jax.tree.structure(
                    result_shape, is_leaf=lambda x: hasattr(x, "shape")
                ),
                leafs,
            )

        cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer,
            sharding_rule=rule_str,
            need_replication_factors=repl,
            # raw shardings: jax's greedy named-sharding decode raises on
            # legal-but-axis-reordered tilings; axes_of decodes with a
            # replicate fallback instead
            decode_shardings=False,
            **dict(fs_key),
        )
        return cp

    def dispatch(*args):
        if not partition_enabled():
            return impl(*args)
        statics = args[n_dyn:]
        shapes = tuple(tuple(a.shape) for a in args[:n_dyn])
        if callable(rule):
            rule_str, fs = rule(shapes, *statics)
        else:
            rule_str = rule
            fs = factor_sizes_fn(shapes, *statics) if factor_sizes_fn else {}
        fs_key = tuple(sorted(fs.items()))
        cp = cache.get((rule_str, fs_key))
        if cp is None:
            cp = cache[(rule_str, fs_key)] = _build(rule_str, fs_key)
        return cp(*args)

    dispatch.__name__ = f"partitioned_{name}"
    return dispatch
