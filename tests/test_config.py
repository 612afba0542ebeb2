from aniportrait_tpu.config import Config, load_config


def test_attribute_access(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb:\n  c: [1, 2]\n  d: hello\n")
    cfg = load_config(str(p))
    assert cfg.a == 1
    assert cfg.b.c == [1, 2]
    assert cfg.b.d == "hello"
    assert cfg.get("missing", 5) == 5
    assert dict(cfg.b)["d"] == "hello"


def test_merge():
    a = Config({"x": 1, "n": {"y": 2, "z": 3}})
    b = a.merge({"n": {"z": 9}, "w": 0})
    assert b.n.z == 9 and b.n.y == 2 and b.x == 1 and b.w == 0
    # original untouched
    assert a.n.z == 3


def test_reference_yaml_shapes(tmp_path):
    """Configs shaped like the reference's inference_v2.yaml parse cleanly."""
    p = tmp_path / "inf.yaml"
    p.write_text(
        """
unet_additional_kwargs:
  use_inflated_groupnorm: true
  use_motion_module: true
  motion_module_resolutions: [1, 2, 4, 8]
  motion_module_kwargs:
    num_attention_heads: 8
    temporal_position_encoding_max_len: 32
noise_scheduler_kwargs:
  beta_start: 0.00085
  beta_end: 0.012
  beta_schedule: "linear"
  prediction_type: "v_prediction"
  rescale_betas_zero_snr: True
  timestep_spacing: "trailing"
"""
    )
    cfg = load_config(str(p))
    assert cfg.unet_additional_kwargs.motion_module_kwargs.num_attention_heads == 8
    from aniportrait_tpu.schedulers import DDIMScheduler

    s = DDIMScheduler(**cfg.noise_scheduler_kwargs.to_dict())
    assert s.prediction_type == "v_prediction"


def test_inference_v1_config_plumbs_unet_knobs():
    """The shipped legacy inference_v1.yaml (parity with the reference's
    configs/inference/inference_v1.yaml) maps onto AniUNet fields: motion
    module out of the mid block, PE max_len 24, non-inflated GroupNorm,
    epsilon-prediction DDIM."""
    import os

    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/inference/inference_v1.yaml"))
    uk = cfg.unet_additional_kwargs
    defs = build_model_defs(
        size="tiny",
        use_motion_module=bool(uk.use_motion_module),
        dtype=jnp.float32,
        scheduler_kwargs=cfg.noise_scheduler_kwargs.to_dict(),
        unet_overrides=dict(
            motion_module_mid_block=bool(uk.motion_module_mid_block),
            motion_module_resolutions=tuple(uk.motion_module_resolutions),
            use_inflated_groupnorm=bool(uk.use_inflated_groupnorm),
            motion_pe_max_len=int(
                uk.motion_module_kwargs.temporal_position_encoding_max_len
            ),
        ),
    )
    unet = defs["denoising_unet"]
    assert unet.motion_module_mid_block is False
    assert unet.motion_pe_max_len == 24
    assert unet.use_inflated_groupnorm is False
    assert defs["scheduler"].prediction_type == "epsilon"
    assert defs["scheduler"].timestep_spacing == "leading"


def test_test_cases_registry_importable():
    """configs/prompts/test_cases.py parity (reference configs/prompts/
    test_cases.py): importable dict keyed by rank."""
    import os

    from aniportrait_tpu.config import import_filename

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = import_filename(os.path.join(repo, "configs/prompts/test_cases.py"))
    assert 0 in mod.TestCasesDict
    case = mod.TestCasesDict[0][0]
    (ref_img, pose_vids), = case.items()
    assert ref_img.endswith(".png") and all(v.endswith(".mp4") for v in pose_vids)
