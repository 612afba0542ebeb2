"""Real-checkpoint validation: run every converter over downloaded weight
files and assert STRICT bijection against the full-size flax module trees
(zero unconsumed torch keys, zero unfilled model params, exact shapes).

This is the weights-arrival gate (docs/WEIGHTS_RUNBOOK.md): the key-set
rules are already proven against synthesized full-size checkpoints
(tests/test_converter_fullsize.py); this module applies the same assertions
to the actual files.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def flat(tree, prefix="") -> Dict[str, Tuple[int, ...]]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flat(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def check_bijection(converted, model_tree, family: str) -> List[str]:
    """Returns a list of problem strings (empty == pass)."""
    got = flat(converted)
    want = flat(model_tree)
    problems = []
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    if missing:
        problems.append(
            f"{family}: {len(missing)} model params UNFILLED, e.g. {missing[:5]}"
        )
    if extra:
        problems.append(
            f"{family}: {len(extra)} converted paths not in the model, e.g. {extra[:5]}"
        )
    bad = [(k, got[k], want[k]) for k in want if k in got and got[k] != want[k]]
    if bad:
        problems.append(f"{family}: {len(bad)} shape mismatches, e.g. {bad[:5]}")
    return problems


def fullsize_model_trees():
    """eval_shape (zero-compile) full-size flax trees for every family."""
    from aniportrait_tpu.audio.audio2mesh import Audio2MeshModel
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel
    from aniportrait_tpu.factory import FULL, pose_feature_shapes
    from aniportrait_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from aniportrait_tpu.models.pose_guider import PoseGuider
    from aniportrait_tpu.models.unet import AniUNet
    from aniportrait_tpu.models.vae import AutoencoderKL

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 768))
    pose_fea = [jnp.zeros(s) for s in pose_feature_shapes(FULL, 1, 1, 8)]

    den = AniUNet(**FULL["unet"], use_motion_module=True)
    ref = AniUNet(**FULL["unet"], use_motion_module=False, has_output_head=False)
    vae = AutoencoderKL(**FULL["vae"])
    clip = CLIPVisionModelWithProjection(**FULL["clip"])
    pg = PoseGuider(**FULL["pose_guider"])
    a2m = Audio2MeshModel()
    a2p = Audio2PoseModel()
    wav = jnp.zeros((1, 16000))
    return {
        "denoising_unet": jax.eval_shape(
            lambda k: den.init(k, x, t, ctx, pose_cond_fea=pose_fea), key
        )["params"],
        "reference_unet": jax.eval_shape(
            lambda k: ref.init(k, x, t, ctx, capture_banks=True), key
        )["params"],
        "vae": jax.eval_shape(vae.init, key, jnp.zeros((1, 64, 64, 3)))["params"],
        "clip": jax.eval_shape(clip.init, key, jnp.zeros((1, 224, 224, 3)))["params"],
        "pose_guider": jax.eval_shape(pg.init, key, jnp.zeros((1, 1, 64, 64, 3))),
        "audio2mesh": jax.eval_shape(lambda k: a2m.init(k, wav, 30), key)["params"],
        "audio2pose": jax.eval_shape(
            lambda k: a2p.init(k, wav, 30, jnp.zeros((1,), jnp.int32)), key
        )["params"],
    }
