"""Model-serving callbacks shared by the Gradio app (``scripts/app.py``)
and the dependency-free HTTP server (``scripts/serve.py``).

The reference serves through a Gradio Blocks app only (reference
``scripts/app.py:146-404``): models are loaded once at module import and the
two callbacks run the full audio2vid / vid2vid flows synchronously inside
the request.  These functions are that same flow, factored so any front-end
can call them.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from datetime import datetime
from typing import Any, Optional

import numpy as np


@dataclass
class ServingModels:
    """Everything loaded once per process (reference app.py:36-101)."""

    pipe: Any  # Pose2VideoPipeline
    a2m: Any = None
    a2m_params: Any = None
    a2p: Any = None
    a2p_params: Any = None


def load_serving_models(
    config_path: str = "./configs/prompts/animation_audio.yaml",
    random_init: bool = False,
    size: str = "full",
    dtype=None,
) -> ServingModels:
    """Load the full serving stack from a prompt config.

    ``random_init=True`` skips the checkpoint zoo (random weights, real
    architectures) — for smoke tests and images without the weights."""
    import jax.numpy as jnp

    from aniportrait_tpu.config import load_config
    from scripts.loader import load_audio_models, load_pipeline

    dtype = dtype or jnp.bfloat16
    config = load_config(config_path)
    audio_cfg = load_config(str(config.audio_inference_config))
    (a2m, a2m_params), (a2p, a2p_params) = load_audio_models(
        audio_cfg, random_init=random_init
    )
    pipe = load_pipeline(config, dtype=dtype, random_init=random_init, size=size)
    return ServingModels(
        pipe=pipe, a2m=a2m, a2m_params=a2m_params, a2p=a2p, a2p_params=a2p_params
    )


def get_headpose_temp(input_video: str) -> np.ndarray:
    """Extract a head-pose template from a driving video
    (reference app.py:103-144)."""
    import cv2
    from scipy.interpolate import interp1d

    from aniportrait_tpu.utils.mp_utils import LMKExtractor
    from aniportrait_tpu.utils.pose_util import (
        matrix_to_euler_and_translation,
        smooth_pose_seq,
    )

    lmk_extractor = LMKExtractor()
    cap = cv2.VideoCapture(input_video)
    fps = cap.get(cv2.CAP_PROP_FPS)
    trans_mat_list = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        result = lmk_extractor(frame)
        if result is None:
            break
        trans_mat_list.append(np.array(result["trans_mat"]).astype(np.float32))
    cap.release()

    trans_mat_arr = np.array(trans_mat_list)
    total = len(trans_mat_arr)
    inv0 = np.linalg.inv(trans_mat_arr[0])
    pose_arr = np.zeros([total, 6])
    for i in range(total):
        euler, trans = matrix_to_euler_and_translation(inv0 @ trans_mat_arr[i])
        pose_arr[i, :3] = euler
        pose_arr[i, 3:6] = trans
    new_fps = 30
    old_time = np.linspace(0, total / fps, total)
    new_time = np.linspace(0, total / fps, int(total * new_fps / fps))
    interp = np.zeros((len(new_time), 6))
    for i in range(6):
        interp[:, i] = interp1d(old_time, pose_arr[:, i])(new_time)
    return smooth_pose_seq(interp)


def _prep_reference(ref_img_rgb: np.ndarray, size: int):
    """Auto-crop the face, resize, extract landmarks + ref pose image.
    Returns (ref_rgb, face_result, ref_pose) or None when no face is found
    (reference app.py:168-183)."""
    import cv2

    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.mp_utils import LMKExtractor
    from aniportrait_tpu.utils.util import crop_face

    lmk_extractor = LMKExtractor()
    vis = FaceMeshVisualizer(forehead_edge=False)
    bgr = cv2.cvtColor(np.asarray(ref_img_rgb), cv2.COLOR_RGB2BGR)
    cropped = crop_face(bgr, lmk_extractor)
    if cropped is None:
        return None
    ref_bgr = cv2.resize(cropped, (size, size))
    ref_rgb = cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB)
    face_result = lmk_extractor(ref_bgr)
    if face_result is None:
        return None
    lmks = np.array(face_result["lmks"]).astype(np.float32)
    ref_pose = vis.draw_landmarks((size, size), lmks, normed=True)
    return ref_rgb, face_result, ref_pose, vis


def _write_result(video, out_dir: str, prefix: str, audio_source: Optional[str]):
    from aniportrait_tpu.utils.util import mux_audio, write_video

    os.makedirs(out_dir, exist_ok=True)
    stamp = datetime.now().strftime("%H%M%S_%f")
    noaudio = f"{out_dir}/{prefix}_{stamp}_noaudio.mp4"
    write_video([(f * 255).astype(np.uint8) for f in video], noaudio, fps=30)
    if audio_source:
        final = noaudio.replace("_noaudio.mp4", ".mp4")
        if mux_audio(noaudio, audio_source, final):
            os.remove(noaudio)
            return final
    return noaudio


def run_audio2video(
    models: ServingModels,
    input_audio: str,
    ref_img_rgb: np.ndarray,
    headpose_video: Optional[str] = None,
    size: int = 512,
    steps: int = 25,
    length: int = 150,
    seed: int = 42,
    out_dir: str = "output/serve",
):
    """Audio-driven generation (reference app.py:146-270).  Returns
    (result_mp4_path, cropped_ref_rgb) or (None, ref) when no face."""
    import jax.numpy as jnp

    from aniportrait_tpu.utils.audio_util import prepare_audio_feature
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.pose_util import project_points
    from scripts.audio2vid import generate_head_pose

    prep = _prep_reference(ref_img_rgb, size)
    if prep is None:
        return None, ref_img_rgb
    ref_rgb, face_result, ref_pose, vis = prep

    sample = prepare_audio_feature(input_audio, fps=30)
    seq_len = sample["seq_len"]
    pred = models.a2m.apply(
        {"params": models.a2m_params},
        jnp.asarray(sample["audio_feature"])[None],
        seq_len,
    )
    pred = np.asarray(pred)[0].reshape(seq_len, -1, 3) + np.array(
        face_result["lmks3d"]
    )

    if headpose_video is not None:
        pose_seq = get_headpose_temp(headpose_video)
        mirrored = np.concatenate((pose_seq, pose_seq[-2:0:-1]), axis=0)
        pose_seq = np.tile(mirrored, (seq_len // len(mirrored) + 1, 1))[:seq_len]
    else:
        pose_seq = generate_head_pose(
            models.a2p, models.a2p_params, sample["audio_feature"], seq_len,
            id_seed=random.randint(0, 99),
        )

    projected = project_points(
        pred, np.array(face_result["trans_mat"]), pose_seq, [size, size]
    )
    pose_images = [
        vis.draw_landmarks((size, size), v, normed=False) for v in projected
    ]
    L = min(length, len(pose_images))
    video = models.pipe(
        ref_rgb, pose_images[:L], ref_pose, size, size, L, steps, 3.5, seed=seed
    )
    return _write_result(video, out_dir, "a2v", input_audio), ref_rgb


def run_video2video(
    models: ServingModels,
    ref_img_rgb: np.ndarray,
    source_video: str,
    size: int = 512,
    steps: int = 25,
    length: int = 150,
    seed: int = 42,
    out_dir: str = "output/serve",
):
    """Face reenactment (reference app.py:272-404)."""
    import cv2

    from aniportrait_tpu.utils.util import get_fps, read_frames
    from scripts.vid2vid import retarget_pose_and_expression

    from aniportrait_tpu.utils.mp_utils import LMKExtractor

    prep = _prep_reference(ref_img_rgb, size)
    if prep is None:
        return None, ref_img_rgb
    ref_rgb, face_result, ref_pose, vis = prep
    lmk_extractor = LMKExtractor()

    frames = read_frames(source_video)
    fps = get_fps(source_video)
    step = 2 if fps == 60 else 1
    results = []
    shape = frames[0].shape[:2]
    for f in frames[::step][:length]:
        res = lmk_extractor(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        if res is None:
            break
        results.append(res)
    projected = retarget_pose_and_expression(results, face_result, list(shape))
    pose_images = [
        cv2.resize(
            vis.draw_landmarks((shape[1], shape[0]), v, normed=False),
            (size, size),
        )
        for v in projected
    ]
    L = len(pose_images)
    video = models.pipe(
        ref_rgb, pose_images, ref_pose, size, size, L, steps, 3.5, seed=seed
    )
    return _write_result(video, out_dir, "v2v", source_video), ref_rgb
