"""Stage-2 (motion module) training entry point.

Parity target: reference ``train_stage_2.py`` — loads stage-1 weights +
AnimateDiff ``mm_sd_v15_v2.ckpt`` into the 3D UNet (from_pretrained_2d
semantics), freezes everything except ``motion_modules``, trains on
16-frame clips (stride-1 with 50% stride-4 augmentation), saves a
motion-module-only checkpoint.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from train_stage_1 import load_flat_npz, save_flat_npz


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="./configs/train/stage2.yaml")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model preset (CI/smoke runs)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.utils.jax_setup import setup

    setup()

    from aniportrait_tpu.config import load_config
    from aniportrait_tpu.factory import build_model_defs, init_random_params
    from aniportrait_tpu.parallel.mesh import (
        init_distributed,
        make_mesh,
        replicate,
        shard_batch,
    )
    from aniportrait_tpu.schedulers import DDIMScheduler
    from aniportrait_tpu.train.dataset import FaceDataset
    from aniportrait_tpu.train.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from aniportrait_tpu.utils.util import seed_everything

    # guarded multi-host (DCN) init — see train_stage_1.py for the contract
    multihost = init_distributed()

    cfg = load_config(args.config)
    seed_everything(cfg.seed)

    train_sched_kwargs = cfg.noise_scheduler_kwargs.to_dict()
    if cfg.get("enable_zero_snr"):
        train_sched_kwargs.update(
            rescale_betas_zero_snr=True,
            timestep_spacing="trailing",
            prediction_type="v_prediction",
        )
    scheduler = DDIMScheduler(**train_sched_kwargs)
    prediction_type = train_sched_kwargs.get("prediction_type", "epsilon")

    # bf16 compute / f32 params+opt (reference fp16 via Accelerate); remat
    # per stage2.yaml:11 gradient_checkpointing — 16-frame 512^2 doesn't fit
    # HBM without it
    mp = str(cfg.solver.get("mixed_precision", "no")).lower()
    compute_dtype = jnp.bfloat16 if mp in ("bf16", "fp16") else jnp.float32
    defs = build_model_defs(
        size="tiny" if args.tiny else "full",
        use_motion_module=True,
        dtype=compute_dtype,
        gradient_checkpointing=bool(cfg.solver.get("gradient_checkpointing", False)),
    )
    defs["scheduler"] = scheduler
    modules = init_random_params(defs)

    params = {
        "reference": modules.reference_params,
        "denoising": modules.denoising_params,
        "pose_guider": modules.pose_guider_variables["params"],
    }
    batch_stats = modules.pose_guider_variables["batch_stats"]
    vae_params, clip_params = modules.vae_params, modules.clip_params

    if not args.random_init:
        from scripts.loader import _find_weights
        from aniportrait_tpu.weights.convert import (
            _deep_merge,
            convert_clip_vision,
            convert_unet,
            convert_vae,
            load_torch_state_dict,
        )

        vae_params, _ = convert_vae(
            load_torch_state_dict(_find_weights(str(cfg.vae_model_path)))
        )
        clip_params, _ = convert_clip_vision(
            load_torch_state_dict(_find_weights(str(cfg.image_encoder_path)))
        )
        # stage-1 output (npz trees) + AnimateDiff motion module
        s1_dir = Path(str(cfg.stage1_ckpt_dir))
        if (s1_dir / "final_params.npz").exists():
            s1 = load_flat_npz(s1_dir / "final_params.npz")
        else:
            s1 = load_flat_npz(
                s1_dir / f"checkpoint-{cfg.stage1_ckpt_step}" / "params.npz"
            )
        _deep_merge(params["reference"], s1["reference"])
        _deep_merge(params["denoising"], s1["denoising"])
        _deep_merge(params["pose_guider"], s1["pose_guider"])
        if cfg.get("mm_path"):
            mm_params, _ = convert_unet(
                load_torch_state_dict(str(cfg.mm_path)), has_output_head=True
            )
            _deep_merge(params["denoising"], mm_params)
        params = jax.tree.map(jnp.asarray, params)
        vae_params = jax.tree.map(jnp.asarray, vae_params)
        clip_params = jax.tree.map(jnp.asarray, clip_params)

    if compute_dtype == jnp.bfloat16:
        from aniportrait_tpu.train.train_step import cast_frozen_to_bf16

        # frozen modules stored bf16, trainable master weights f32 — the
        # reference's fp16-frozen / fp32-trainable split under Accelerate
        params = cast_frozen_to_bf16(params, stage=2)
        vae_params, clip_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), (vae_params, clip_params)
        )

    tx = make_optimizer(
        params,
        stage=2,
        learning_rate=float(cfg.solver.learning_rate),
        weight_decay=float(cfg.solver.adam_weight_decay),
        max_grad_norm=float(cfg.solver.max_grad_norm),
    )
    grad_accum = int(cfg.solver.get("gradient_accumulation_steps", 1))
    if grad_accum > 1:
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    frozen = (vae_params, clip_params)
    train_step = make_train_step(
        defs,
        tx,
        scheduler,
        prediction_type=prediction_type,
        snr_gamma=float(cfg.get("snr_gamma", 0.0)),
        noise_offset=float(cfg.get("noise_offset", 0.0)),
        uncond_ratio=float(cfg.get("uncond_ratio", 0.1)),
        stage=2,
    )

    # data-parallel mesh no larger than the batch allows
    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, n_dev + 1) if int(cfg.train_bs) % d == 0)
    mesh = make_mesh(mesh_size)
    state = init_train_state(params, batch_stats, tx)
    if mesh.devices.size > 1:
        # ZeRO-1: Adam moments shard over the data axis (params stay
        # replicated; the update all-gather is GSPMD-inserted) — beyond
        # the reference's replicated-state DDP (SURVEY #33/#34)
        from aniportrait_tpu.parallel.mesh import shard_opt_state

        state = shard_opt_state(state, mesh)
    else:
        state = replicate(state, mesh)

    dataset = FaceDataset(
        json_path=str(cfg.data.json_path),
        sample_size=tuple(cfg.data.sample_size),
        sample_stride=int(cfg.data.sample_stride),
        sample_n_frames=int(cfg.data.sample_n_frames),
        sample_stride_aug=bool(cfg.data.get("sample_stride_aug", False)),
        is_image=False,
        seed=int(cfg.seed),
    )

    save_dir = Path(cfg.output_dir) / cfg.exp_name
    save_dir.mkdir(parents=True, exist_ok=True)
    from aniportrait_tpu.train.trackers import Tracker

    tracker = Tracker(str(save_dir), str(cfg.exp_name))

    max_steps = args.max_steps or int(cfg.solver.max_train_steps)
    rng = jax.random.PRNGKey(int(cfg.seed))
    from aniportrait_tpu.train.prefetch import prefetch

    local_bs = int(cfg.train_bs)
    if multihost:
        assert local_bs % jax.process_count() == 0
        local_bs //= jax.process_count()
        dataset.shard(jax.process_index(), jax.process_count())
    batches = prefetch(dataset.batches(local_bs), depth=2)
    with mesh:
        for step, batch in enumerate(batches):
            if step >= max_steps:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, frozen, shard_batch(batch, mesh), sub)
            if step % 10 == 0:
                print(tracker.log(step, {"loss": float(metrics["loss"])}))
            if (step + 1) % int(cfg.checkpointing_steps) == 0:
                from aniportrait_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(str(save_dir / "orbax"), state, step + 1, keep=1)
            val_steps = int(cfg.val.validation_steps) if cfg.get("val") else 0
            if val_steps and (step + 1) % val_steps == 0:
                try:
                    from aniportrait_tpu.train.validation import log_validation

                    log_validation(
                        defs, vae_params, clip_params, state, dataset,
                        str(save_dir / "validation"), step + 1, image_mode=False,
                        width=int(cfg.data.sample_size[0]),
                        height=int(cfg.data.sample_size[1]),
                    )
                except Exception as e:
                    print(f"validation failed at step {step + 1}: {e}")

    # motion-module-only deployable dump (train_stage_2.py:743-771)
    motion_only = {
        k: v for k, v in jax.device_get(state.params)["denoising"].items()
        if "motion" in k
    }
    save_flat_npz(save_dir / "motion_module_final.npz", motion_only)
    print(f"done, saved to {save_dir}")


if __name__ == "__main__":
    main()
