"""Validation-time sampling during training.

Parity target: reference ``log_validation`` (train_stage_1.py:131-208,
train_stage_2.py:140-238) — every N steps, run the real inference pipeline
on random validation samples and write side-by-side ref/pose/generated
grids for human inspection.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from aniportrait_tpu.pipelines.pose2vid import (
    PipelineModules,
    Pose2ImagePipeline,
    Pose2VideoPipeline,
)


def pipeline_from_train_state(defs: Dict[str, Any], vae_params, clip_params, state):
    modules = PipelineModules(
        vae=defs["vae"],
        vae_params=vae_params,
        clip=defs["clip"],
        clip_params=clip_params,
        reference_unet=defs["reference_unet"],
        reference_params=state.params["reference"],
        denoising_unet=defs["denoising_unet"],
        denoising_params=state.params["denoising"],
        pose_guider=defs["pose_guider"],
        pose_guider_variables={
            "params": state.params["pose_guider"],
            "batch_stats": state.batch_stats,
        },
        scheduler=defs["scheduler"],
    )
    return modules


def log_validation(
    defs,
    vae_params,
    clip_params,
    state,
    dataset,
    out_dir: str,
    step: int,
    n_samples: int = 2,
    image_mode: bool = True,
    width: int = 512,
    height: int = 512,
    num_inference_steps: int = 20,
):
    """Sample the current model and write ref/pose/result grids."""
    from aniportrait_tpu.utils.util import save_videos_grid

    os.makedirs(out_dir, exist_ok=True)
    modules = pipeline_from_train_state(defs, vae_params, clip_params, state)
    if image_mode:
        pipe = Pose2ImagePipeline(modules)
    else:
        pipe = Pose2VideoPipeline(modules)

    import cv2

    for i in range(n_samples):
        sample = dataset.validation_sample(np.random.randint(0, len(dataset)))
        ref = sample["ref_image"]
        poses = [cv2.resize(p, (width, height)) for p in sample["pose_images"]]
        if image_mode:
            img = pipe(ref, poses[0], width, height, num_inference_steps)
            row = np.concatenate(
                [
                    cv2.resize(ref, (width, height)).astype(np.float32) / 255,
                    poses[0].astype(np.float32) / 255,
                    img,
                    cv2.resize(sample["frames"][0], (width, height)).astype(np.float32)
                    / 255,
                ],
                axis=1,
            )
            path = os.path.join(out_dir, f"val_{step}_{i}.png")
            cv2.imwrite(path, cv2.cvtColor((row * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        else:
            L = len(poses)
            video = pipe(ref, poses, None, width, height, L, num_inference_steps)
            ref_row = np.repeat(
                (cv2.resize(ref, (width, height)).astype(np.float32) / 255)[None],
                L, axis=0,
            )
            pose_row = np.stack([p.astype(np.float32) / 255 for p in poses])
            grid = np.stack([ref_row, pose_row, video])
            save_videos_grid(grid, os.path.join(out_dir, f"val_{step}_{i}.mp4"), fps=8)
