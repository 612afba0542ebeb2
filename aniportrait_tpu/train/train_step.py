"""Functional training steps for stage 1 (image) and stage 2 (motion).

Parity targets: reference ``train_stage_1.py`` / ``train_stage_2.py``:
  * VAE-encode targets and reference image (sampled latents, x0.18215)
    (train_stage_1.py:493-497, 539-547)
  * noise offset 0.05 per (batch, channel) (:499-504)
  * t ~ U[0, 1000) per sample (:506-513)
  * 10% CFG dropout: zero CLIP *image* through the encoder and skip the
    reference pass (:522-536; Net.forward :63-98) — expressed here as
    drop_ref masking, which zeroes the same gradient paths
  * epsilon / v-prediction targets (:556-571)
  * Min-SNR-gamma=5 weighting, +1 for v-prediction (:583-605, :101-128)
  * grad clip 1.0, AdamW(1e-5, 0.9/0.999, wd 1e-2) [8-bit Adam in the
    reference; same math, full-precision states here]
  * stage 1 trains ReferenceNet (minus up_blocks.3), denoising UNet, pose
    guider (:304-317); stage 2 trains ONLY motion modules
    (train_stage_2.py:345-356)

TPU mapping: one jitted step, data-parallel over the batch axis of a
``Mesh('data')`` with replicated params (the reference's DDP, SURVEY #33).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from aniportrait_tpu.schedulers import DDIMScheduler, compute_snr

VAE_SCALE = 0.18215


class TrainState(NamedTuple):
    params: Any  # {'reference':..., 'denoising':..., 'pose_guider':...}
    batch_stats: Any  # pose guider BN stats
    opt_state: Any
    step: jnp.ndarray


def _freeze_mask_stage1(params):
    """Trainable mask: everything except ReferenceNet up-block 3 (the
    reference freezes reference_unet.up_blocks.3, train_stage_1.py:304-317)."""

    def mark(tree, frozen):
        return jax.tree.map(lambda _: "freeze" if frozen else "train", tree)

    ref = {
        k: mark(v, k.startswith("up_3_") or k.startswith("attn_up_3_"))
        for k, v in params["reference"].items()
    }
    return {
        "reference": ref,
        "denoising": mark(params["denoising"], False),
        "pose_guider": mark(params["pose_guider"], False),
    }


def _freeze_mask_stage2(params):
    """Trainable: motion modules only."""

    def mark(tree, frozen):
        return jax.tree.map(lambda _: "freeze" if frozen else "train", tree)

    den = {
        k: mark(v, "motion" not in k) for k, v in params["denoising"].items()
    }
    return {
        "reference": mark(params["reference"], True),
        "denoising": den,
        "pose_guider": mark(params["pose_guider"], True),
    }


def cast_frozen_to_bf16(params, stage: int):
    """Store FROZEN leaves in bf16 (trainable master weights stay f32) —
    the reference's behaviour: Accelerate moves the frozen modules to fp16
    (train_stage_2.py weight_dtype) while DDP keeps trainables fp32.  At
    stage-2 full scale this is ~4 GB of HBM."""
    mask = _freeze_mask_stage1(params) if stage == 1 else _freeze_mask_stage2(params)

    def cast(p, lbl):
        if lbl != "freeze":
            return p
        if isinstance(p, jax.ShapeDtypeStruct):  # shape-only accounting
            return jax.ShapeDtypeStruct(p.shape, jnp.bfloat16)
        return p.astype(jnp.bfloat16)

    return jax.tree.map(cast, params, mask)


def make_optimizer(
    params,
    stage: int,
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-2,
    max_grad_norm: float = 1.0,
    adam_8bit: bool = False,
):
    """``adam_8bit``: block-wise int8 moments (train/optim8bit.py) — the
    reference's bitsandbytes 8-bit Adam (train_stage_1.py:366-376,
    ``use_8bit_adam``).  Required to fit the stage-1 full trainable set
    on one 16 GiB chip: f32 Adam moments alone are ~13 GB there
    (docs/memory_r5.json stage-1 rows)."""
    mask = _freeze_mask_stage1(params) if stage == 1 else _freeze_mask_stage2(params)
    if adam_8bit:
        from aniportrait_tpu.train.optim8bit import adamw8bit

        inner = adamw8bit(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        )
    else:
        inner = optax.adamw(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        )
    tx = optax.multi_transform(
        {
            "train": optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                inner,
            ),
            "freeze": optax.set_to_zero(),
        },
        mask,
    )
    return tx


def make_train_step(
    defs: Dict[str, Any],
    tx,
    scheduler: DDIMScheduler,
    prediction_type: str = "v_prediction",
    snr_gamma: float = 5.0,
    noise_offset: float = 0.05,
    uncond_ratio: float = 0.1,
    compiler_options: Dict[str, Any] | None = None,
    stage: int = 1,
    donate: bool = True,
):
    """Returns ``train_step(state, frozen, batch, rng) -> (state, metrics)``
    with ``frozen = (vae_params, clip_params)`` passed as arguments (NOT
    captured — closures would embed the frozen weights as HLO constants).

    ``donate``: donate the TrainState buffers so the updated params/opt
    state reuse the old allocation — without it the ~13 GB state lives
    twice during the step (the caller must rebind:
    ``state, _ = train_step(state, ...)``).  Set False when the old state
    must stay readable (the CPU dryrun's update-delta check).

    ``stage`` selects the freeze mask: gradients are computed ONLY for the
    trainable subtree (the torch reference's ``requires_grad=False``
    equivalent).  Differentiating the full tree and zeroing afterwards
    allocated ~7 GB of frozen-weight gradient buffers at stage-2 full
    scale — the difference between OOM and fitting in 16 GB HBM.

    batch (channels-last, [-1, 1] images):
      pixel_values:         (b, f, H, W, 3)
      pixel_values_pose:    (b, f, H, W, 3)
      pixel_values_ref_img: (b, H, W, 3)
      clip_ref_image:       (b, 224, 224, 3) CLIP-normalised
    """
    vae = defs["vae"]
    clip = defs["clip"]
    ref_unet = defs["reference_unet"]
    den_unet = defs["denoising_unet"]
    pose_guider = defs["pose_guider"]

    def vae_sample(vae_params, img, rng):
        mean, logvar = vae.apply({"params": vae_params}, img, method=vae.encode)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        # stop_gradient: nothing trainable is upstream of the frozen VAE, but
        # without it JAX linearises through the encoder and keeps multi-GB
        # f32 residuals alive for a backward pass that is pure dead code
        # (observed: 2x 2 GB jvp(AutoencoderKL.encode) buffers at stage-2
        # full scale)
        return jax.lax.stop_gradient(
            (mean + jnp.exp(0.5 * logvar) * eps) * VAE_SCALE
        )

    def loss_fn(params, batch_stats, frozen, batch, rng):
        vae_params, clip_params = frozen
        b, f = batch["pixel_values"].shape[:2]
        keys = jax.random.split(rng, 6)

        # target latents (per frame)
        px = batch["pixel_values"].reshape(b * f, *batch["pixel_values"].shape[2:])
        latents = vae_sample(vae_params, px, keys[0])
        hl, wl = latents.shape[1:3]
        latents = latents.reshape(b, f, hl, wl, 4)

        ref_latents = vae_sample(vae_params, batch["pixel_values_ref_img"], keys[1])

        # CFG dropout: zero the CLIP *image* through the encoder + drop ref.
        # DELIBERATE DEVIATION FROM per-sample CONVENTION: one Bernoulli per
        # STEP, applied to every row of the batch — this reproduces the
        # reference's quirk (train_stage_1.py:522-536 draws a single
        # random.random() per step, so at batch>1 all samples drop together),
        # and the same flag also gates the ReferenceNet bank drop below.
        # Standard per-sample dropout would be
        # jax.random.uniform(keys[2], (b,)) < uncond_ratio.
        uncond = jax.random.uniform(keys[2], ()) < uncond_ratio
        clip_img = jnp.where(uncond, 0.0, 1.0) * batch["clip_ref_image"]
        embeds = jax.lax.stop_gradient(
            clip.apply({"params": clip_params}, clip_img)
        )  # frozen CLIP: same dead-backward argument as vae_sample
        ctx = embeds[:, None, :]  # (b, 1, 768)

        noise = jax.random.normal(keys[3], latents.shape, latents.dtype)
        if noise_offset > 0:
            noise = noise + noise_offset * jax.random.normal(
                keys[4], (b, 1, 1, 1, latents.shape[-1]), latents.dtype
            )
        t = jax.random.randint(keys[5], (b,), 0, scheduler.num_train_timesteps)

        noisy = scheduler.add_noise(latents, noise, t)
        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = scheduler.get_velocity(latents, noise, t)
        else:
            raise ValueError(prediction_type)

        pose_fea, new_stats = pose_guider.apply(
            {"params": params["pose_guider"], "batch_stats": batch_stats},
            batch["pixel_values_pose"],
            train=True,
            mutable=["batch_stats"],
        )

        _, banks = ref_unet.apply(
            {"params": params["reference"]},
            ref_latents[:, None],
            jnp.zeros((b,), jnp.int32),
            ctx,
            capture_banks=True,
        )

        drop_ref = jnp.broadcast_to(uncond, (b,))
        pred, _ = den_unet.apply(
            {"params": params["denoising"]},
            noisy,
            t,
            ctx,
            pose_cond_fea=pose_fea,
            ref_banks=banks,
            drop_ref=drop_ref,
        )

        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if snr_gamma and snr_gamma > 0:
            snr = compute_snr(scheduler.alphas_cumprod, t)
            if prediction_type == "v_prediction":
                snr = snr + 1.0
            weights = jnp.minimum(snr, snr_gamma) / snr
            per_sample = err.reshape(b, -1).mean(axis=1) * weights
            loss = per_sample.mean()
        else:
            loss = err.mean()
        return loss, new_stats["batch_stats"]

    mask_fn = _freeze_mask_stage1 if stage == 1 else _freeze_mask_stage2

    @partial(
        jax.jit,
        compiler_options=compiler_options,
        donate_argnums=(0,) if donate else (),
    )
    def train_step(state: TrainState, frozen, batch, rng):
        from flax import traverse_util

        # trace-time partition: diff only the trainable leaves
        flat = traverse_util.flatten_dict(state.params)
        labels = traverse_util.flatten_dict(mask_fn(state.params))
        train_f = {k: v for k, v in flat.items() if labels[k] == "train"}
        frozen_f = {k: v for k, v in flat.items() if labels[k] != "train"}

        def loss_train(train_leaves, batch_stats):
            params = traverse_util.unflatten_dict({**frozen_f, **train_leaves})
            return loss_fn(params, batch_stats, frozen, batch, rng)

        (loss, new_stats), grads_train = jax.value_and_grad(
            loss_train, has_aux=True
        )(train_f, state.batch_stats)
        # full-tree zeros for the frozen part: multi_transform's set_to_zero
        # never reads them, so XLA folds the broadcasts away
        grads = traverse_util.unflatten_dict(
            {**{k: jnp.zeros_like(v) for k, v in frozen_f.items()}, **grads_train}
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, {"loss": loss}

    return train_step


def init_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))
