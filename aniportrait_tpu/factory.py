"""Model factory: build the full AniPortrait stack (or a tiny test-scale
variant) and initialise / load parameters.

Full-size architecture constants come from the reference's shipped configs:
SD-1.5 UNet (320/640/1280/1280, 8 heads, cross-dim 768), sd-vae-ft-mse VAE,
CLIP ViT-L/14 image encoder (projection 768), PoseGuider at 320 channels,
motion module 8 heads / PE 32 (configs/inference/inference_v2.yaml).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from aniportrait_tpu.models.clip_vision import CLIPVisionModelWithProjection
from aniportrait_tpu.models.pose_guider import PoseGuider
from aniportrait_tpu.models.unet import AniUNet
from aniportrait_tpu.models.vae import AutoencoderKL
from aniportrait_tpu.pipelines.pose2vid import PipelineModules
from aniportrait_tpu.schedulers import DDIMScheduler

FULL = dict(
    unet=dict(block_out_channels=(320, 640, 1280, 1280), attention_heads=8,
              cross_attention_dim=768),
    vae=dict(block_out_channels=(128, 256, 512, 512)),
    clip=dict(hidden=1024, layers=24, heads=16, intermediate=4096, patch=14,
              image_size=224, projection_dim=768),
    pose_guider=dict(noise_latent_channels=320),
)

TINY = dict(
    unet=dict(block_out_channels=(32, 64, 128, 128), attention_heads=8,
              cross_attention_dim=16),
    vae=dict(block_out_channels=(32, 32, 64, 64)),
    clip=dict(hidden=32, layers=2, heads=4, intermediate=64, patch=8,
              image_size=224, projection_dim=16),
    pose_guider=dict(noise_latent_channels=32),
)

INFERENCE_SCHEDULER = dict(
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="linear",
    clip_sample=False,
    steps_offset=1,
    prediction_type="v_prediction",
    rescale_betas_zero_snr=True,
    timestep_spacing="trailing",
)


def build_model_defs(
    size: str = "full",
    use_motion_module: bool = True,
    dtype=jnp.float32,
    scheduler_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    cfg = FULL if size == "full" else TINY
    return dict(
        vae=AutoencoderKL(**cfg["vae"], dtype=dtype),
        clip=CLIPVisionModelWithProjection(**cfg["clip"], dtype=dtype),
        reference_unet=AniUNet(
            **cfg["unet"], use_motion_module=False, has_output_head=False, dtype=dtype
        ),
        denoising_unet=AniUNet(
            **cfg["unet"], use_motion_module=use_motion_module, dtype=dtype
        ),
        pose_guider=PoseGuider(**cfg["pose_guider"], dtype=dtype),
        scheduler=DDIMScheduler(**(scheduler_kwargs or INFERENCE_SCHEDULER)),
        size=size,
    )


def init_random_params(defs: Dict[str, Any], seed: int = 0) -> PipelineModules:
    """Random-init all parameters (for tests/benchmarks without checkpoints)."""
    cfg = FULL if defs["size"] == "full" else TINY
    proj = cfg["clip"]["projection_dim"]
    img = cfg["clip"]["image_size"]
    key = jax.random.PRNGKey(seed)

    vae_p = jax.jit(defs["vae"].init)(key, jnp.zeros((1, 64, 64, 3)))["params"]
    clip_p = jax.jit(defs["clip"].init)(key, jnp.zeros((1, img, img, 3)))["params"]

    x1 = jnp.zeros((1, 1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, proj))
    ref_p = jax.jit(
        lambda k: defs["reference_unet"].init(k, x1, t, ctx, capture_banks=True)
    )(key)["params"]

    nc = cfg["pose_guider"]["noise_latent_channels"]
    pose_fea = [
        jnp.zeros((1, 1, 8, 8, nc)),
        jnp.zeros((1, 1, 4, 4, nc)),
        jnp.zeros((1, 1, 2, 2, nc * 2)),
        jnp.zeros((1, 1, 1, 1, nc * 4)),
        jnp.zeros((1, 1, 1, 1, nc * 4)),
    ]
    den_p = jax.jit(
        lambda k: defs["denoising_unet"].init(k, x1, t, ctx, pose_cond_fea=pose_fea)
    )(key)["params"]

    pg_v = jax.jit(defs["pose_guider"].init)(key, jnp.zeros((1, 1, 64, 64, 3)))

    return PipelineModules(
        vae=defs["vae"],
        vae_params=vae_p,
        clip=defs["clip"],
        clip_params=clip_p,
        reference_unet=defs["reference_unet"],
        reference_params=ref_p,
        denoising_unet=defs["denoising_unet"],
        denoising_params=den_p,
        pose_guider=defs["pose_guider"],
        pose_guider_variables=pg_v,
        scheduler=defs["scheduler"],
    )
