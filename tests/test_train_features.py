"""Training levers: gradient checkpointing (remat), grad accumulation,
bf16 mixed-precision compute — VERDICT r1 items 2-4 of 'What's missing'.

Micro-scale models: these tests compile the full fwd+bwd step, which is
minutes at tiny scale on a 1-core host and seconds at micro scale.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aniportrait_tpu.factory import MICRO, build_model_defs, init_abstract_params
from aniportrait_tpu.train.train_step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _setup(dtype=jnp.float32, gradient_checkpointing=False):
    defs = build_model_defs(
        size="micro", use_motion_module=True, dtype=dtype,
        gradient_checkpointing=gradient_checkpointing,
    )
    modules = init_abstract_params(defs)
    params = {
        "reference": modules.reference_params,
        "denoising": modules.denoising_params,
        "pose_guider": modules.pose_guider_variables["params"],
    }
    stats = modules.pose_guider_variables["batch_stats"]
    frozen = (modules.vae_params, modules.clip_params)
    return defs, params, stats, frozen


def _batch(b=2, f=2, H=32):
    rs = np.random.RandomState(0)
    img = MICRO["clip"]["image_size"]
    return {
        "pixel_values": rs.randn(b, f, H, H, 3).astype(np.float32),
        "pixel_values_pose": rs.randn(b, f, H, H, 3).astype(np.float32),
        "pixel_values_ref_img": rs.randn(b, H, H, 3).astype(np.float32),
        "clip_ref_image": rs.randn(b, img, img, 3).astype(np.float32),
    }


def _loss_and_grads(gradient_checkpointing):
    defs, params, stats, frozen = _setup(
        gradient_checkpointing=gradient_checkpointing
    )
    tx = make_optimizer(params, stage=1)
    step = make_train_step(defs, tx, defs["scheduler"])
    state = init_train_state(params, stats, tx)
    new_state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(0))
    return float(metrics["loss"]), new_state


def test_remat_matches_no_remat():
    """remat only changes the recompute schedule — loss and the updated
    params must match the non-remat step bit-for-bit (same f32 math)."""
    loss_a, state_a = _loss_and_grads(False)
    loss_b, state_b = _loss_and_grads(True)
    assert np.isclose(loss_a, loss_b, rtol=1e-6), (loss_a, loss_b)
    la = jax.tree.leaves(state_a.params["denoising"])
    lb = jax.tree.leaves(state_b.params["denoising"])
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_compute_trains():
    defs, params, stats, frozen = _setup(dtype=jnp.bfloat16)
    tx = make_optimizer(params, stage=1)
    step = make_train_step(defs, tx, defs["scheduler"])
    state = init_train_state(params, stats, tx)
    new_state, metrics = step(state, frozen, _batch(), jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # params stay f32 (mixed precision: bf16 compute, f32 master weights)
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(new_state.params)
    )
    delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(new_state.params["denoising"]),
            jax.tree.leaves(state.params["denoising"]),
        )
    )
    assert delta > 0.0


def test_gradient_accumulation_multisteps():
    """MultiSteps(k=2): params move only on the 2nd micro-step."""
    defs, params, stats, frozen = _setup()
    tx = optax.MultiSteps(make_optimizer(params, stage=1), every_k_schedule=2)
    # donate=False: this test reads the pre-step params after the update
    step = make_train_step(defs, tx, defs["scheduler"], donate=False)
    state = init_train_state(params, stats, tx)

    s1, _ = step(state, frozen, _batch(), jax.random.PRNGKey(0))
    moved_1 = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(s1.params["denoising"]),
            jax.tree.leaves(state.params["denoising"]),
        )
    )
    assert moved_1 == 0.0, "params must not move on the first micro-step"

    s2, _ = step(s1, frozen, _batch(), jax.random.PRNGKey(1))
    moved_2 = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(s2.params["denoising"]),
            jax.tree.leaves(s1.params["denoising"]),
        )
    )
    assert moved_2 > 0.0, "params must move once k grads are accumulated"
