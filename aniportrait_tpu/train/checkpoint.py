"""Orbax checkpoint/resume for training state.

Replaces the reference's ``accelerator.save_state``/``load_state`` +
``checkpoint-*`` directory scanning (train_stage_1.py:462-478, 632-636):
``save`` writes full TrainState (params, BN stats, optimizer state, step),
``latest_step``/``restore`` implement ``resume_from_checkpoint: 'latest'``.

Trainable-only variant (r5): at the reference's every-2000-step cadence
(train_stage_1.py:632-636) a FULL-state save was ~680 s for the ~10 GB
stage-2 state — dominated by the device->host fetch of frozen bf16
subtrees that are bit-reconstructible from the weight-conversion step
and never change during training.  ``save_train_checkpoint`` excludes
them (the frozen Adam slots are already empty ``optax.MaskedNode``s
under ``multi_transform``), records their shapes/dtypes for restore
validation, and optionally returns BEFORE the disk write finishes
(Orbax async) so the train loop overlaps serialization with compute.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(ckpt_dir: str, keep: int = 1):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, state: Any, step: int, keep: int = 1):
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state_template: Any, step: Optional[int] = None):
    """Restore into the structure of ``state_template`` (a concrete state)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.device_get(state_template))
    )
    mgr.close()
    return restored, step


# ------------------------------------------------- trainable-only checkpoints
def _trainable_mask(params, stage: int):
    from aniportrait_tpu.train.train_step import (
        _freeze_mask_stage1,
        _freeze_mask_stage2,
    )

    return (
        _freeze_mask_stage1(params) if stage == 1
        else _freeze_mask_stage2(params)
    )


# frozen leaf stand-in: 1 byte (Orbax refuses zero-size arrays)
_PLACEHOLDER = np.zeros((1,), np.int8)


def _split_trainable(state, stage: int):
    """(saved_subtree, frozen_leaf_meta): frozen param leaves are replaced
    by a zero-byte placeholder (keeping the tree structure intact for
    Orbax) and their shape/dtype goes into a JSON manifest keyed by tree
    path for restore-time validation."""
    mask = _trainable_mask(state.params, stage)
    params_train = jax.tree.map(
        lambda p, lbl: p if lbl == "train" else _PLACEHOLDER,
        state.params, mask,
    )
    meta = {}
    flat_p = jax.tree_util.tree_leaves_with_path(state.params)
    flat_m = jax.tree.leaves(mask)
    for (path, leaf), lbl in zip(flat_p, flat_m):
        if lbl != "train":
            meta[jax.tree_util.keystr(path)] = [
                list(np.shape(leaf)), str(leaf.dtype),
            ]
    saved = state._replace(params=params_train)
    return saved, meta


def save_train_checkpoint(ckpt_dir: str, state: Any, step: int, stage: int,
                          keep: int = 1, block: bool = True):
    """Save ONLY what training mutates: trainable params, optimizer state
    (frozen slots are empty MaskedNodes already), BN stats, step.  With
    ``block=False`` returns an Orbax ``CheckpointManager`` whose
    ``wait_until_finished()``/``close()`` the caller runs later — compute
    continues while the state serializes (call ``finish_async_save`` or
    the next ``save_train_checkpoint`` to join)."""
    import orbax.checkpoint as ocp

    saved, meta = _split_trainable(state, stage)
    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(saved)))
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "frozen_meta.json"), "w") as f:
        json.dump({"stage": stage, "frozen": meta}, f)
    if block:
        mgr.wait_until_finished()
        mgr.close()
        return None
    return mgr


def finish_async_save(mgr) -> None:
    if mgr is not None:
        mgr.wait_until_finished()
        mgr.close()


def restore_train_checkpoint(ckpt_dir: str, state_template: Any, stage: int,
                             step: Optional[int] = None):
    """Restore a trainable-only checkpoint: trainable params/opt state/BN
    stats/step from disk, frozen param leaves FROM THE TEMPLATE (they come
    from the weight-conversion step and are validated against the saved
    shape/dtype manifest)."""
    import orbax.checkpoint as ocp

    meta_path = os.path.join(ckpt_dir, "frozen_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta["stage"] != stage:
        raise ValueError(
            f"checkpoint at {ckpt_dir} is stage {meta['stage']}, "
            f"requested stage {stage}"
        )
    saved_tpl, _ = _split_trainable(state_template, stage)
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.device_get(saved_tpl))
    )
    mgr.close()
    # validate the frozen leaves the template brings against the manifest
    frozen_meta = meta["frozen"]
    for (path, leaf) in jax.tree_util.tree_leaves_with_path(
        state_template.params
    ):
        key = jax.tree_util.keystr(path)
        if key in frozen_meta:
            want_shape, want_dtype = frozen_meta[key]
            if list(np.shape(leaf)) != want_shape or str(leaf.dtype) != want_dtype:
                raise ValueError(
                    f"frozen leaf {key} mismatch: template "
                    f"{np.shape(leaf)}/{leaf.dtype} vs checkpoint "
                    f"{want_shape}/{want_dtype}"
                )
    mask = _trainable_mask(state_template.params, stage)
    merged_params = jax.tree.map(
        lambda tpl, res, lbl: res if lbl == "train" else tpl,
        state_template.params, restored.params, mask,
    )
    merged = restored._replace(params=merged_params)
    return merged, step
