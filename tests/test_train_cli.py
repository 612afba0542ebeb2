"""End-to-end training CLI smoke: synthetic dataset -> 2 steps of
train_stage_1 --tiny --random-init, loss logged, params saved."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_dataset(root):
    vid_dir = os.path.join(root, "vidA")
    os.makedirs(vid_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    frame_paths, lmk_paths = [], []
    for i in range(8):
        img = rs.randint(0, 255, (64, 64, 3), np.uint8)
        fp = os.path.join(vid_dir, f"{i:04d}.png")
        cv2.imwrite(fp, img)
        lmks = rs.rand(478, 3).astype(np.float32) * 0.6 + 0.2  # in-frame
        lp = os.path.join(vid_dir, f"{i:04d}_lmks.npy")
        np.save(lp, lmks)
        frame_paths.append(fp)
        lmk_paths.append(lp)
    manifest = {
        "vidA": {
            "video_clip_num": 1,
            "clip_data_list": [
                {"frame_path_list": frame_paths, "lmks_list": lmk_paths}
            ],
        }
    }
    mpath = os.path.join(root, "train.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return mpath


@pytest.mark.slow
def test_stage1_smoke(tmp_path):
    mpath = _make_dataset(str(tmp_path))
    cfg = f"""
data:
  json_path: "{mpath}"
  sample_size: [64, 64]
  sample_stride: 4
  sample_n_frames: 2
solver:
  gradient_accumulation_steps: 1
  max_train_steps: 2
  max_grad_norm: 1.0
  learning_rate: 1.0e-5
  adam_weight_decay: 1.0e-2
noise_scheduler_kwargs:
  num_train_timesteps: 1000
  beta_start: 0.00085
  beta_end: 0.012
  beta_schedule: "scaled_linear"
  steps_offset: 1
  clip_sample: false
train_bs: 1
uncond_ratio: 0.1
noise_offset: 0.05
snr_gamma: 5.0
enable_zero_snr: True
seed: 42
resume_from_checkpoint: ''
checkpointing_steps: 1000
exp_name: 'smoke'
output_dir: '{tmp_path}/out'
"""
    cfg_path = tmp_path / "stage1.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        USE_TF="0",
        XLA_FLAGS="",  # drop the 8-virtual-device flag the test env sets
    )
    result = subprocess.run(
        [sys.executable, "train_stage_1.py", "--config", str(cfg_path),
         "--tiny", "--random-init", "--max-steps", "2"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1500,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    log = tmp_path / "out" / "smoke" / "train_log.jsonl"
    assert log.exists()
    rec = json.loads(log.read_text().splitlines()[0])
    assert np.isfinite(rec["loss"])
    assert (tmp_path / "out" / "smoke" / "final_params.npz").exists()


@pytest.mark.slow
def test_stage2_smoke(tmp_path):
    mpath = _make_dataset(str(tmp_path))
    cfg = f"""
data:
  json_path: "{mpath}"
  sample_size: [64, 64]
  sample_stride: 1
  sample_n_frames: 2
  sample_stride_aug: True
solver:
  max_train_steps: 1
  max_grad_norm: 1.0
  learning_rate: 1.0e-5
  adam_weight_decay: 1.0e-2
noise_scheduler_kwargs:
  num_train_timesteps: 1000
  beta_start: 0.00085
  beta_end: 0.012
  beta_schedule: "scaled_linear"
  steps_offset: 1
  clip_sample: false
train_bs: 1
uncond_ratio: 0.1
noise_offset: 0.05
snr_gamma: 5.0
enable_zero_snr: True
seed: 42
resume_from_checkpoint: ''
checkpointing_steps: 1000
exp_name: 'smoke2'
output_dir: '{tmp_path}/out'
stage1_ckpt_dir: '{tmp_path}/nonexistent'
stage1_ckpt_step: 0
"""
    cfg_path = tmp_path / "stage2.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", USE_TF="0", XLA_FLAGS="")
    result = subprocess.run(
        [sys.executable, "train_stage_2.py", "--config", str(cfg_path),
         "--tiny", "--random-init", "--max-steps", "1"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1500,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert (tmp_path / "out" / "smoke2" / "motion_module_final.npz").exists()
