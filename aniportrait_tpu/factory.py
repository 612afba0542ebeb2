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
    pose_guider=dict(noise_latent_channels=32, attn_heads=4, attn_dim_head=8),
)

# Minimum architecture that still exercises every component TYPE (down/mid/up
# with spatial attention + motion module, VAE, CLIP, pose pyramid): used by
# the driver's dryrun_multichip, where single-core XLA:CPU compile time of
# the full train step is the binding constraint.
MICRO = dict(
    unet=dict(block_out_channels=(32, 32), attention_heads=4,
              cross_attention_dim=16, layers_per_block=1),
    vae=dict(block_out_channels=(32, 32, 32, 32)),
    clip=dict(hidden=32, layers=1, heads=4, intermediate=64, patch=8,
              image_size=32, projection_dim=16),
    pose_guider=dict(noise_latent_channels=32, attn_heads=4, attn_dim_head=8,
                     num_stages=2),
)

SIZES = {"full": FULL, "tiny": TINY, "micro": MICRO}


def pose_feature_shapes(cfg, b: int, f: int, hl: int, wl: int | None = None):
    """Shapes of the pose-guider feature list for a UNet latent (hl, wl).

    pose[0] matches the latent grid; pose[i+1] sits at the resolution AFTER
    down block i's downsample with channels == unet ch[i]
    (reference unet_3d.py:484-510)."""
    wl = wl or hl
    ch = list(cfg["unet"]["block_out_channels"])
    n = len(ch)
    shapes = [(b, f, hl, wl, ch[0])]
    h, w = hl, wl
    for i in range(n):
        if i < n - 1:
            h, w = h // 2, w // 2
        shapes.append((b, f, h, w, ch[i]))
    return shapes

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
    gradient_checkpointing: bool = False,
    unet_overrides: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """``unet_overrides``: extra AniUNet fields for the denoising UNet — the
    knobs the reference exposes via ``unet_additional_kwargs`` in the
    inference YAMLs (configs/inference/inference_v{1,2}.yaml), e.g.
    ``motion_module_mid_block``, ``motion_pe_max_len``,
    ``use_inflated_groupnorm``."""
    return dict(
        **_build_defs_inner(
            size, use_motion_module, dtype, gradient_checkpointing,
            unet_overrides or {},
        ),
        scheduler=DDIMScheduler(**(scheduler_kwargs or INFERENCE_SCHEDULER)),
        size=size,
    )


def _build_defs_inner(size, use_motion_module, dtype, gradient_checkpointing,
                      unet_overrides={}):
    cfg = SIZES[size]
    return dict(
        vae=AutoencoderKL(**cfg["vae"], dtype=dtype),
        clip=CLIPVisionModelWithProjection(**cfg["clip"], dtype=dtype),
        reference_unet=AniUNet(
            **cfg["unet"], use_motion_module=False, has_output_head=False,
            gradient_checkpointing=gradient_checkpointing, dtype=dtype
        ),
        denoising_unet=AniUNet(
            **cfg["unet"], use_motion_module=use_motion_module,
            gradient_checkpointing=gradient_checkpointing, dtype=dtype,
            **unet_overrides,
        ),
        pose_guider=PoseGuider(**cfg["pose_guider"], dtype=dtype),
    )


def _fill_abstract(tree, seed: int = 0):
    """Materialise an ``eval_shape`` pytree with host-side numpy values.

    Compiling the flax ``init`` functions on a 1-core CPU host costs minutes
    (XLA:CPU is single-threaded); ``eval_shape`` traces without compiling, and
    a numpy fill gives statistically-sane parameters: norm scales/BN variances
    one, biases/BN means zero, everything else N(0, 0.02).
    """
    import numpy as np

    rs = np.random.RandomState(seed)

    def fill(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        shape, dtype = leaf.shape, leaf.dtype
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        if name in ("bias", "mean"):
            return np.zeros(shape, dtype)
        return (rs.randn(*shape) * 0.02).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, tree)


def init_shape_params(defs: Dict[str, Any]) -> PipelineModules:
    """PipelineModules whose parameter leaves are ``ShapeDtypeStruct``s —
    no host or device memory allocated.  Only usable for shape-level work
    (AOT ``lower().compile()``, ``eval_shape``): e.g. the HBM accounting
    of full-size samplers in ``scripts/memory_report.py``, where
    materialising ~3.4 GB of zero weights would be pure waste."""
    shapes = _abstract_shapes(defs)
    return PipelineModules(
        vae=defs["vae"],
        vae_params=shapes["vae"]["params"],
        clip=defs["clip"],
        clip_params=shapes["clip"]["params"],
        reference_unet=defs["reference_unet"],
        reference_params=shapes["ref"]["params"],
        denoising_unet=defs["denoising_unet"],
        denoising_params=shapes["den"]["params"],
        pose_guider=defs["pose_guider"],
        pose_guider_variables=shapes["pg"],
        scheduler=defs["scheduler"],
    )


def _abstract_shapes(defs: Dict[str, Any]):
    cfg = SIZES[defs["size"]]
    proj = cfg["clip"]["projection_dim"]
    img = cfg["clip"]["image_size"]
    key = jax.random.PRNGKey(0)

    x1 = jnp.zeros((1, 1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, proj))
    pose_fea = [jnp.zeros(s) for s in pose_feature_shapes(cfg, 1, 1, 8)]

    return dict(
        vae=jax.eval_shape(defs["vae"].init, key, jnp.zeros((1, 64, 64, 3))),
        clip=jax.eval_shape(defs["clip"].init, key, jnp.zeros((1, img, img, 3))),
        ref=jax.eval_shape(
            lambda k: defs["reference_unet"].init(k, x1, t, ctx, capture_banks=True),
            key,
        ),
        den=jax.eval_shape(
            lambda k: defs["denoising_unet"].init(k, x1, t, ctx, pose_cond_fea=pose_fea),
            key,
        ),
        pg=jax.eval_shape(defs["pose_guider"].init, key, jnp.zeros((1, 1, 64, 64, 3))),
    )


def init_abstract_params(defs: Dict[str, Any], seed: int = 0) -> PipelineModules:
    """Like :func:`init_random_params` but with ZERO XLA compilation —
    shapes from ``jax.eval_shape``, values from numpy. Use wherever real
    pretrained weights will be loaded anyway or only plumbing is tested
    (the driver's ``dryrun_multichip``, sharding tests)."""
    vals = _fill_abstract(_abstract_shapes(defs), seed)

    return PipelineModules(
        vae=defs["vae"],
        vae_params=vals["vae"]["params"],
        clip=defs["clip"],
        clip_params=vals["clip"]["params"],
        reference_unet=defs["reference_unet"],
        reference_params=vals["ref"]["params"],
        denoising_unet=defs["denoising_unet"],
        denoising_params=vals["den"]["params"],
        pose_guider=defs["pose_guider"],
        pose_guider_variables=vals["pg"],
        scheduler=defs["scheduler"],
    )


def init_random_params(defs: Dict[str, Any], seed: int = 0) -> PipelineModules:
    """Random-init all parameters (for tests/benchmarks without checkpoints)."""
    cfg = SIZES[defs["size"]]
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

    pose_fea = [jnp.zeros(s) for s in pose_feature_shapes(cfg, 1, 1, 8)]
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
