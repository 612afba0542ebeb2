"""Build inference pipelines from reference-style prompt configs + the
PyTorch checkpoint zoo (converted on load).

Mirrors the model-loading preamble shared by the reference CLIs
(e.g. scripts/audio2vid.py:54-125, scripts/pose2vid.py:52-116), including
``from_pretrained_2d`` merge semantics (2D SD weights + motion module,
strict=False overlay of the AniPortrait fine-tuned .pth files).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from aniportrait_tpu.config import Config, load_config
from aniportrait_tpu.factory import build_model_defs
from aniportrait_tpu.pipelines.pose2vid import PipelineModules, Pose2VideoPipeline
from aniportrait_tpu.weights.convert import (
    convert_audio2mesh,
    convert_audio2pose,
    convert_clip_vision,
    convert_pose_guider,
    convert_unet,
    convert_vae,
    load_torch_state_dict,
)


def _find_weights(dir_or_file: str, subfolder: Optional[str] = None) -> str:
    path = dir_or_file
    if subfolder:
        path = os.path.join(path, subfolder)
    if os.path.isdir(path):
        for name in (
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.bin",
            "model.safetensors",
            "pytorch_model.bin",
        ):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"no weight file found in {path}")
    return path


def _to_jax(tree):
    return jax.tree.map(jnp.asarray, tree)


def load_pipeline(config: Config, dtype=jnp.bfloat16,
                  encoder_cache_interval: int = 1,
                  random_init: bool = False,
                  size: str = "full",
                  window_fusion: bool = False,
                  context_rotate: bool = False,
                  force_approx: bool = False) -> Pose2VideoPipeline:
    """config: a prompt YAML (configs/prompts/animation*.yaml shape).

    ``random_init=True`` skips the checkpoint zoo (random weights, real
    architectures; ``size`` picks the factory preset) — for smoke runs and
    serving tests in images without the weights.

    Approximations (encoder cache, window fusion) pass through the measured
    quality gate (utils/quality_gate.py): divergence beyond the gated
    regime refuses to run unless ``force_approx``."""
    from aniportrait_tpu.utils.quality_gate import enforce_approximation_gate

    enforce_approximation_gate(
        encoder_cache_interval=encoder_cache_interval,
        window_fusion=window_fusion,
        context_rotate=context_rotate,
        force=force_approx,
    )
    infer_cfg = load_config(str(config.inference_config))
    uk = infer_cfg.unet_additional_kwargs
    mk = uk.motion_module_kwargs
    # Map the reference's unet_additional_kwargs knobs (the v1/v2 inference
    # YAML deltas: configs/inference/inference_v1.yaml has mid_block=false,
    # PE max_len 24, no inflated GN) onto AniUNet fields.
    overrides = {}
    if "motion_module_mid_block" in uk:
        overrides["motion_module_mid_block"] = bool(uk.motion_module_mid_block)
    if "motion_module_resolutions" in uk:
        overrides["motion_module_resolutions"] = tuple(uk.motion_module_resolutions)
    if "use_inflated_groupnorm" in uk:
        overrides["use_inflated_groupnorm"] = bool(uk.use_inflated_groupnorm)
    else:
        overrides["use_inflated_groupnorm"] = False  # reference v1 default
    if mk and "temporal_position_encoding_max_len" in mk:
        overrides["motion_pe_max_len"] = int(mk.temporal_position_encoding_max_len)
    defs = build_model_defs(
        size=size,
        use_motion_module=bool(uk.use_motion_module),
        dtype=dtype,
        scheduler_kwargs=infer_cfg.noise_scheduler_kwargs.to_dict(),
        unet_overrides=overrides,
    )
    if random_init:
        from aniportrait_tpu.factory import init_random_params

        modules = init_random_params(defs)
        return Pose2VideoPipeline(
            modules, dtype=dtype, encoder_cache_interval=encoder_cache_interval,
            window_fusion=window_fusion, context_rotate=context_rotate,
        )

    vae_sd = load_torch_state_dict(_find_weights(str(config.pretrained_vae_path)))
    vae_params, _ = convert_vae(vae_sd)

    clip_sd = load_torch_state_dict(_find_weights(str(config.image_encoder_path)))
    clip_params, _ = convert_clip_vision(clip_sd)

    base_sd = load_torch_state_dict(
        _find_weights(str(config.pretrained_base_model_path), "unet")
    )
    # ReferenceNet: SD-1.5 base overlaid with reference_unet.pth
    ref_sd = dict(base_sd)
    ref_sd.update(load_torch_state_dict(str(config.reference_unet_path)))
    ref_params, _ = convert_unet(ref_sd, has_output_head=False)

    # Denoising UNet: SD-1.5 base + motion module + denoising_unet.pth
    den_sd = dict(base_sd)
    if config.get("motion_module_path"):
        den_sd.update(load_torch_state_dict(str(config.motion_module_path)))
    den_sd.update(load_torch_state_dict(str(config.denoising_unet_path)))
    den_params, den_unused = convert_unet(den_sd, has_output_head=True)

    pg_sd = load_torch_state_dict(str(config.pose_guider_path))
    pg_vars, _ = convert_pose_guider(pg_sd)

    modules = PipelineModules(
        vae=defs["vae"],
        vae_params=_to_jax(vae_params),
        clip=defs["clip"],
        clip_params=_to_jax(clip_params),
        reference_unet=defs["reference_unet"],
        reference_params=_to_jax(ref_params),
        denoising_unet=defs["denoising_unet"],
        denoising_params=_to_jax(den_params),
        pose_guider=defs["pose_guider"],
        pose_guider_variables=_to_jax(pg_vars),
        scheduler=defs["scheduler"],
    )
    return Pose2VideoPipeline(
        modules, dtype=dtype, encoder_cache_interval=encoder_cache_interval,
        window_fusion=window_fusion, context_rotate=context_rotate,
    )


def load_audio_models(audio_config: Config, random_init: bool = False):
    """Build + load Audio2Mesh / Audio2Pose (reference audio2vid.py:66-72).

    ``random_init=True`` fills statistically-sane random parameters without
    loading (or compiling) anything — for smoke runs without the weights."""
    from aniportrait_tpu.audio.audio2mesh import Audio2MeshModel
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel

    a2m = Audio2MeshModel(
        out_dim=audio_config.a2m_model.out_dim,
        latent_dim=audio_config.a2m_model.latent_dim,
        only_last_features=bool(audio_config.a2m_model.only_last_fetures),
    )
    a2p = Audio2PoseModel(
        out_dim=audio_config.a2p_model.out_dim,
        latent_dim=audio_config.a2p_model.latent_dim,
        only_last_features=bool(audio_config.a2p_model.only_last_fetures),
    )
    if random_init:
        from aniportrait_tpu.factory import _fill_abstract

        wav = jnp.zeros((1, 16000), jnp.float32)
        rng = jax.random.PRNGKey(0)
        a2m_params = _fill_abstract(
            jax.eval_shape(lambda r, w: a2m.init(r, w, 8), rng, wav)
        )["params"]
        a2p_params = _fill_abstract(
            jax.eval_shape(
                lambda r, w: a2p.init(r, w, 8, jnp.zeros((1,), jnp.int32)),
                rng, wav,
            )
        )["params"]
        return (a2m, a2m_params), (a2p, a2p_params)
    a2m_sd = load_torch_state_dict(str(audio_config.pretrained_model.a2m_ckpt))
    a2m_params, _ = convert_audio2mesh(a2m_sd)
    a2p_sd = load_torch_state_dict(str(audio_config.pretrained_model.a2p_ckpt))
    a2p_params, _ = convert_audio2pose(a2p_sd)

    # wav2vec2 base weights come from the wav2vec2 model dir when the task
    # checkpoints only hold the heads (from_pretrained=True in the config)
    for params, model_cfg in ((a2m_params, audio_config.a2m_model),
                              (a2p_params, audio_config.a2p_model)):
        if not params.get("audio_encoder"):
            from aniportrait_tpu.weights.convert import convert_wav2vec2

            w2v_sd = load_torch_state_dict(
                _find_weights(str(model_cfg.model_path))
            )
            enc, _ = convert_wav2vec2(w2v_sd)
            params["audio_encoder"] = enc

    return (a2m, _to_jax(a2m_params)), (a2p, _to_jax(a2p_params))
