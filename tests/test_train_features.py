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


def test_trainable_only_checkpoint_roundtrip(tmp_path):
    """save_train_checkpoint excludes frozen subtrees; restore merges them
    back from the template (r5: the 680 s full-state save was dominated by
    frozen bf16 leaves reconstructible from conversion)."""
    from aniportrait_tpu.train.checkpoint import (
        restore_train_checkpoint,
        save_train_checkpoint,
    )
    from aniportrait_tpu.train.train_step import _freeze_mask_stage2

    defs, params, stats, frozen = _setup()
    tx = make_optimizer(params, stage=2)
    state = init_train_state(params, stats, tx)
    # make trainable + frozen leaves distinguishable
    mask = _freeze_mask_stage2(state.params)
    marked = jax.tree.map(
        lambda p, lbl: p + (1.0 if lbl == "train" else 2.0)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
        state.params, mask,
    )
    state = state._replace(params=marked, step=jnp.asarray(7, jnp.int32))

    ckpt = str(tmp_path / "orbax")
    save_train_checkpoint(ckpt, state, 7, stage=2, block=True)

    # the on-disk checkpoint must NOT contain the frozen leaves' bytes
    import os
    total = 0
    for root, _, files in os.walk(ckpt):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    full = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(state)
    )
    frozen_bytes = sum(
        np.asarray(p).nbytes
        for p, lbl in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(mask)
        )
        if lbl != "train"
    )
    assert total < full - frozen_bytes * 0.5, (
        f"checkpoint {total}B looks like a full-state save ({full}B, "
        f"frozen {frozen_bytes}B)"
    )

    # template: fresh init (different trainables, same frozen content)
    template = init_train_state(marked, stats, tx)
    restored, step = restore_train_checkpoint(ckpt, template, stage=2)
    assert step == 7 and int(restored.step) == 7
    for a, b, lbl in zip(
        jax.tree.leaves(restored.params),
        jax.tree.leaves(state.params),
        jax.tree.leaves(mask),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # stage mismatch is refused
    with pytest.raises(ValueError, match="stage"):
        restore_train_checkpoint(ckpt, template, stage=1)


def test_trainable_only_checkpoint_async(tmp_path):
    from aniportrait_tpu.train.checkpoint import (
        finish_async_save,
        restore_train_checkpoint,
        save_train_checkpoint,
    )

    defs, params, stats, frozen = _setup()
    tx = make_optimizer(params, stage=2)
    state = init_train_state(params, stats, tx)
    ckpt = str(tmp_path / "orbax")
    mgr = save_train_checkpoint(ckpt, state, 3, stage=2, block=False)
    finish_async_save(mgr)
    restored, step = restore_train_checkpoint(ckpt, state, stage=2)
    assert step == 3
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adamw8bit_tracks_fp32():
    """Block-quantized-moment AdamW follows the f32 optax.adamw trajectory
    within a loose band and reaches a similar loss on a small convex-ish
    problem (reference: bitsandbytes 8-bit Adam, train_stage_1.py:366)."""
    from aniportrait_tpu.train.optim8bit import adamw8bit

    rs = np.random.RandomState(0)
    A = jnp.asarray(rs.randn(64, 32), jnp.float32)
    b = jnp.asarray(rs.randn(64), jnp.float32)

    def loss(w):
        return jnp.mean((A @ w - b) ** 2)

    def run(tx, steps=200):
        w = jnp.zeros((32,), jnp.float32)
        state = tx.init(w)
        vals = []
        for _ in range(steps):
            g = jax.grad(loss)(w)
            upd, state = tx.update(g, state, w)
            w = optax.apply_updates(w, upd)
            vals.append(float(loss(w)))
        return w, vals

    lr = 3e-2
    w8, v8 = run(adamw8bit(lr, weight_decay=1e-3))
    wf, vf = run(optax.adamw(lr, weight_decay=1e-3))
    # endpoint losses comparable (within 10% relative or tiny absolute)
    assert v8[-1] < max(1.1 * vf[-1], vf[-1] + 1e-3), (v8[-1], vf[-1])
    # trajectories stay close early (quantization noise is small)
    assert abs(v8[10] - vf[10]) < 0.15 * (abs(vf[0]) + 1e-6)


def test_adamw8bit_state_is_int8():
    from aniportrait_tpu.train.optim8bit import Adam8bitState, adamw8bit

    tx = adamw8bit(1e-3)
    params = {"a": jnp.zeros((300,)), "b": jnp.zeros((5, 7))}
    state = tx.init(params)
    assert isinstance(state, Adam8bitState)
    leaves_q = [state.m["a"].q, state.m["b"].q, state.v["a"].q]
    for q in leaves_q:
        assert q.dtype == jnp.int8
    # padded to block multiple
    assert state.m["a"].q.shape == (512,)  # 300 -> 2 blocks of 256
    assert state.m["b"].q.shape == (256,)

    # one update keeps shapes/dtypes and moves params
    g = jax.tree.map(jnp.ones_like, params)
    upd, state2 = tx.update(g, state, params)
    assert upd["a"].shape == (300,) and upd["b"].shape == (5, 7)
    assert state2.m["a"].q.dtype == jnp.int8
    assert float(jnp.max(jnp.abs(upd["a"]))) > 0


def test_make_optimizer_8bit_stage1_state_small():
    """8-bit Adam under the stage-1 freeze mask: persistent moment state
    is ~2 bytes/param instead of 8."""
    defs, params, stats, frozen = _setup()
    tx = make_optimizer(params, stage=1, adam_8bit=True)
    state = jax.eval_shape(tx.init, params)
    total_param_bytes = sum(
        np.prod(s.shape) * 4 for s in jax.tree.leaves(
            jax.eval_shape(lambda: params)
        )
    )
    state_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree.leaves(state)
    )
    # f32 adam would be ~2x param bytes (m+v); int8 is ~param/2 x2 + scales
    assert state_bytes < 0.8 * total_param_bytes, (
        state_bytes, total_param_bytes
    )
    # and it actually trains a step at micro scale
    step = make_train_step(defs, tx, defs["scheduler"])
    st = init_train_state(params, stats, tx)
    new_state, metrics = step(st, frozen, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    delta = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree.leaves(new_state.params["denoising"]),
            jax.tree.leaves(st.params["denoising"]),
        )
    )
    assert delta > 0.0
