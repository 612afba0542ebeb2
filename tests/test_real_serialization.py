"""Real on-disk serialization round-trip (VERDICT r3 item 4).

`tests/test_converter_fullsize.py` proves naming/shape bijection from
in-memory dicts; real weights arrive as FILES — torch zip archives
(`denoising_unet.pth`, reference scripts/pose2vid.py:91-100), HF
`pytorch_model.bin` / `diffusion_pytorch_model.safetensors` directories
(diffusers `from_pretrained`, reference scripts/pose2vid.py:59-81), and a
TorchScript `.pt` (film).  This test writes REAL files in each container
format, filled with the synthesized full-size key sets, and runs
`scripts/validate_weights.py` end-to-end on them — after this, download is
the only untested step of the weights-arrival runbook
(docs/WEIGHTS_RUNBOOK.md).

Slow tier: writes ~14 GB of zero-filled checkpoints to tmp (deleted on
exit) and converts every family at full size.
"""

import numpy as np
import pytest

import keygen_torch as kg

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def _torch_sd(keys, dtype=torch.float32):
    return {k: torch.zeros(s, dtype=dtype) for k, s in keys.items()}


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    """Write the complete checkpoint zoo the reference's weight contract
    ships (README.md:100-145), one real container per family."""
    root = tmp_path_factory.mktemp("weights_zoo")

    # sd-vae-ft-mse: diffusers dir with a SAFETENSORS file
    from safetensors.numpy import save_file

    vae_dir = root / "sd-vae-ft-mse"
    vae_dir.mkdir()
    save_file(
        {k: np.zeros(s, np.float32) for k, s in kg.vae_keys().items()},
        str(vae_dir / "diffusion_pytorch_model.safetensors"),
    )

    # image encoder: HF dir with pytorch_model.bin (torch zip archive)
    clip_dir = root / "image_encoder"
    clip_dir.mkdir()
    torch.save(_torch_sd(kg.clip_vision_keys()), str(clip_dir / "pytorch_model.bin"))

    # SD-1.5 base: diffusers layout <base>/unet/diffusion_pytorch_model.bin
    base_dir = root / "stable-diffusion-v1-5"
    (base_dir / "unet").mkdir(parents=True)
    sd15 = _torch_sd(kg.sd15_unet_keys())
    torch.save(sd15, str(base_dir / "unet" / "diffusion_pytorch_model.bin"))

    # AniPortrait .pth zoo: plain torch zip archives of state dicts
    torch.save(sd15, str(root / "reference_unet.pth"))
    torch.save(_torch_sd(kg.denoising_unet_keys()), str(root / "denoising_unet.pth"))
    torch.save(_torch_sd(kg.mm_sd_v15_v2_keys()), str(root / "motion_module.pth"))
    torch.save(_torch_sd(kg.pose_guider_keys()), str(root / "pose_guider.pth"))

    # audio checkpoints: a2m wrapped in {"state_dict": ...} (the torch
    # checkpoint convention load_torch_state_dict unwraps), a2p plain
    torch.save(
        {"state_dict": _torch_sd(kg.audio2mesh_keys(include_encoder=True))},
        str(root / "audio2mesh.pt"),
    )
    torch.save(
        _torch_sd(kg.audio2pose_keys(include_encoder=True)),
        str(root / "audio2pose.pt"),
    )
    return root


def test_validate_weights_cli_on_real_files(zoo, tmp_path):
    """The arrival-day command (docs/WEIGHTS_RUNBOOK.md step 1) passes on
    real on-disk containers for every family."""
    cfg = tmp_path / "prompt.yaml"
    cfg.write_text(
        f"""
pretrained_base_model_path: '{zoo / 'stable-diffusion-v1-5'}'
pretrained_vae_path: '{zoo / 'sd-vae-ft-mse'}'
image_encoder_path: '{zoo / 'image_encoder'}'
denoising_unet_path: '{zoo / 'denoising_unet.pth'}'
reference_unet_path: '{zoo / 'reference_unet.pth'}'
pose_guider_path: '{zoo / 'pose_guider.pth'}'
motion_module_path: '{zoo / 'motion_module.pth'}'
inference_config: './configs/inference/inference_v2.yaml'
weight_dtype: 'fp16'
"""
    )
    acfg = tmp_path / "audio_prompt.yaml"
    acfg.write_text(
        f"""
pretrained_model:
  a2m_ckpt: '{zoo / 'audio2mesh.pt'}'
  a2p_ckpt: '{zoo / 'audio2pose.pt'}'
"""
    )
    from scripts.validate_weights import main

    rc = main(["--config", str(cfg), "--audio-config", str(acfg)])
    assert rc == 0


def test_load_torch_state_dict_containers(zoo):
    """The low-level loader parses every on-disk container it claims to:
    torch zip (.pth/.bin), {"state_dict": ...} wrappers, safetensors."""
    from aniportrait_tpu.weights.convert import load_torch_state_dict

    # torch zip archive
    sd = load_torch_state_dict(str(zoo / "pose_guider.pth"))
    want = kg.pose_guider_keys()
    assert set(sd) == set(want)
    k0 = next(iter(want))
    assert tuple(sd[k0].shape) == tuple(want[k0])

    # state_dict wrapper unwrapped
    sd = load_torch_state_dict(str(zoo / "audio2mesh.pt"))
    assert set(sd) == set(kg.audio2mesh_keys(include_encoder=True))

    # safetensors
    sd = load_torch_state_dict(
        str(zoo / "sd-vae-ft-mse" / "diffusion_pytorch_model.safetensors")
    )
    assert set(sd) == set(kg.vae_keys())
    assert isinstance(next(iter(sd.values())), np.ndarray)


def test_load_pipeline_from_zoo_traces(zoo, tmp_path):
    """Runbook step-3 replay (VERDICT r4 item 9): the generation-day load
    path — ``scripts/loader.load_pipeline`` on the real on-disk zoo —
    converts every family into a working ``Pose2VideoPipeline`` whose
    FULL-SIZE sampler traces end to end (eval_shape; no compile: the
    full-size XLA:CPU compile is hours on this host, and the chip-side
    compile of the same program is proven by bench.py/memory_report)."""
    import jax

    cfg = tmp_path / "prompt.yaml"
    cfg.write_text(
        f"""
pretrained_base_model_path: '{zoo / 'stable-diffusion-v1-5'}'
pretrained_vae_path: '{zoo / 'sd-vae-ft-mse'}'
image_encoder_path: '{zoo / 'image_encoder'}'
denoising_unet_path: '{zoo / 'denoising_unet.pth'}'
reference_unet_path: '{zoo / 'reference_unet.pth'}'
pose_guider_path: '{zoo / 'pose_guider.pth'}'
motion_module_path: '{zoo / 'motion_module.pth'}'
inference_config: './configs/inference/inference_v2.yaml'
weight_dtype: 'fp16'
"""
    )
    from aniportrait_tpu.config import load_config
    from scripts.loader import load_pipeline

    pipe = load_pipeline(load_config(str(cfg)))
    # every family converted into real arrays at full size
    assert len(jax.tree.leaves(pipe.m.denoising_params)) > 300
    assert len(jax.tree.leaves(pipe.m.reference_params)) > 300
    total = sum(
        x.size for x in jax.tree.leaves(pipe.m.denoising_params)
    )
    assert total > 8e8, f"denoising UNet looks truncated: {total} params"

    # the driver-config sampler traces shape-correctly on these params
    sampler, args = pipe.abstract_sampler(512, 512, 16, 2, 3.5, True)
    out = jax.eval_shape(sampler, *args)
    assert tuple(out.shape) == (1, 16, 64, 64, 4)
