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
