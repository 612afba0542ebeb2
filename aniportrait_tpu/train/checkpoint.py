"""Orbax checkpoint/resume for training state.

Replaces the reference's ``accelerator.save_state``/``load_state`` +
``checkpoint-*`` directory scanning (train_stage_1.py:462-478, 632-636):
``save`` writes full TrainState (params, BN stats, optimizer state, step),
``latest_step``/``restore`` implement ``resume_from_checkpoint: 'latest'``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


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
