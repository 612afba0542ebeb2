"""Stage-1 (image) training entry point.

Parity target: reference ``train_stage_1.py`` — trains ReferenceNet (minus
up-block 3), denoising UNet (no motion modules), and PoseGuider on single
frames with Min-SNR loss, noise offset, CFG dropout; VAE/CLIP frozen;
checkpoints every N steps keeping 1; per-epoch deployable .npz dumps.

TPU mapping: one jitted train step, data-parallel over a 1-D device mesh
(replaces Accelerate DDP); Orbax-free simple npz checkpointing this round.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="./configs/train/stage1.yaml")
    p.add_argument("--random-init", action="store_true",
                   help="skip pretrained weight loading (smoke runs)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model preset (CI/smoke runs)")
    return p.parse_args()


def save_flat_npz(path, tree):
    import jax

    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    visit("", jax.device_get(tree))
    np.savez(path, **flat)


def load_flat_npz(path):
    data = np.load(path)
    tree = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


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

    # multi-host (DCN) data parallelism — the reference's `accelerate launch`
    # multi-node DDP (README.md:226). No-op unless JAX_COORDINATOR_ADDRESS /
    # JAX_MULTIHOST_AUTODETECT=1 is set; afterwards jax.devices() is global
    # and the 'data' mesh spans hosts.
    multihost = init_distributed()
    from aniportrait_tpu.schedulers import DDIMScheduler
    from aniportrait_tpu.train.dataset import FaceDataset
    from aniportrait_tpu.train.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from aniportrait_tpu.utils.util import seed_everything

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

    # mixed precision: bf16 COMPUTE (flax module dtype), f32 params/optimizer
    # states — the TPU equivalent of the reference's Accelerate fp16
    # (configs/train/stage1.yaml:9); 'fp16' maps to bf16 (TPU-native)
    mp = str(cfg.solver.get("mixed_precision", "no")).lower()
    compute_dtype = jnp.bfloat16 if mp in ("bf16", "fp16") else jnp.float32
    defs = build_model_defs(
        size="tiny" if args.tiny else "full",
        use_motion_module=False,
        dtype=compute_dtype,
        gradient_checkpointing=bool(cfg.solver.get("gradient_checkpointing", False)),
    )
    defs["scheduler"] = scheduler

    if args.random_init:
        modules = init_random_params(defs)
        vae_params, clip_params = modules.vae_params, modules.clip_params
        params = {
            "reference": modules.reference_params,
            "denoising": modules.denoising_params,
            "pose_guider": modules.pose_guider_variables["params"],
        }
        batch_stats = modules.pose_guider_variables["batch_stats"]
    else:
        from scripts.loader import _find_weights
        from aniportrait_tpu.weights.convert import (
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
        base_sd = load_torch_state_dict(
            _find_weights(str(cfg.base_model_path), "unet")
        )
        ref_params, _ = convert_unet(base_sd, has_output_head=False)
        den_params, _ = convert_unet(base_sd, has_output_head=True)
        modules = init_random_params(defs)  # random pose guider
        params = {
            "reference": ref_params,
            "denoising": den_params,
            "pose_guider": modules.pose_guider_variables["params"],
        }
        batch_stats = modules.pose_guider_variables["batch_stats"]
        vae_params = jax.tree.map(jnp.asarray, vae_params)
        clip_params = jax.tree.map(jnp.asarray, clip_params)
        params = jax.tree.map(jnp.asarray, params)

    tx = make_optimizer(
        params,
        stage=1,
        learning_rate=float(cfg.solver.learning_rate),
        weight_decay=float(cfg.solver.adam_weight_decay),
        max_grad_norm=float(cfg.solver.max_grad_norm),
    )
    grad_accum = int(cfg.solver.get("gradient_accumulation_steps", 1))
    if grad_accum > 1:
        # the reference accumulates via Accelerate (train_stage_1.py:212-217);
        # optax.MultiSteps applies the update every k-th micro-step
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
    )

    # data-parallel mesh no larger than the batch allows
    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, n_dev + 1) if int(cfg.train_bs) % d == 0)
    mesh = make_mesh(mesh_size)
    state = init_train_state(params, batch_stats, tx)

    save_dir_early = Path(cfg.output_dir) / cfg.exp_name
    start_step = 0
    if str(cfg.get("resume_from_checkpoint", "")) == "latest":
        from aniportrait_tpu.train.checkpoint import (
            latest_step,
            restore_train_checkpoint,
        )

        ckpt_root = str(save_dir_early / "orbax")
        step_found = latest_step(ckpt_root)
        if step_found is not None:
            # trainable-only checkpoint: frozen subtrees come from the
            # just-initialised state (the weight-conversion output)
            state, start_step = restore_train_checkpoint(
                ckpt_root, state, stage=1, step=step_found
            )
            print(f"resumed from step {start_step}")

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
        is_image=True,
        seed=int(cfg.seed),
    )

    save_dir = Path(cfg.output_dir) / cfg.exp_name
    save_dir.mkdir(parents=True, exist_ok=True)
    from aniportrait_tpu.train.trackers import Tracker

    tracker = Tracker(str(save_dir), str(cfg.exp_name))

    max_steps = args.max_steps or int(cfg.solver.max_train_steps)
    rng = jax.random.PRNGKey(int(cfg.seed))
    from aniportrait_tpu.train.prefetch import prefetch

    # multi-host: each process loads its global_bs / process_count slice;
    # shard_batch assembles the global array without cross-host copies
    local_bs = int(cfg.train_bs)
    if multihost:
        assert local_bs % jax.process_count() == 0, (
            f"train_bs {local_bs} must divide by process_count"
            f" {jax.process_count()}"
        )
        local_bs //= jax.process_count()
        dataset.shard(jax.process_index(), jax.process_count())
    batches = prefetch(dataset.batches(local_bs), depth=2)
    ckpt_mgr = None  # in-flight async checkpoint save, joined before the next
    with mesh:
        for step, batch in enumerate(batches):
            if step >= max_steps:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, frozen, shard_batch(batch, mesh), sub)
            if step % 10 == 0:
                print(tracker.log(step, {"loss": float(metrics["loss"])}))
            if (step + 1) % int(cfg.checkpointing_steps) == 0:
                from aniportrait_tpu.train.checkpoint import (
                    finish_async_save,
                    save_train_checkpoint,
                )

                # trainable-only + async: the loop keeps training while the
                # previous snapshot serializes (frozen bf16 subtrees are
                # reconstructible from conversion and are not written)
                finish_async_save(ckpt_mgr)
                ckpt_mgr = save_train_checkpoint(
                    str(save_dir / "orbax"), state, step + 1, stage=1,
                    keep=1, block=False,
                )
            val_steps = int(cfg.val.validation_steps) if cfg.get("val") else 0
            if val_steps and (step + 1) % val_steps == 0:
                try:
                    from aniportrait_tpu.train.validation import log_validation

                    log_validation(
                        defs, vae_params, clip_params, state, dataset,
                        str(save_dir / "validation"), step + 1, image_mode=True,
                        width=int(cfg.data.sample_size[0]),
                        height=int(cfg.data.sample_size[1]),
                    )
                except Exception as e:  # validation must not kill training
                    print(f"validation failed at step {step + 1}: {e}")

    save_flat_npz(save_dir / "final_params.npz", state.params)
    print(f"done, saved to {save_dir}")


if __name__ == "__main__":
    main()
