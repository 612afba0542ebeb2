"""Gradio serving app (reference ``scripts/app.py``): two-tab Blocks UI
(Audio2Video / Video2Video) with face auto-crop and in-app head-pose
template extraction.  Requires the ``gradio`` package (not in the base
image) and the pretrained weight zoo."""

from __future__ import annotations

import os
import random
from datetime import datetime

import numpy as np


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


def build_app(config_path: str = "./configs/prompts/animation_audio.yaml"):
    import gradio as gr

    from aniportrait_tpu.config import load_config
    from scripts.audio2vid import generate_head_pose
    from scripts.loader import load_audio_models, load_pipeline

    config = load_config(config_path)
    audio_cfg = load_config(str(config.audio_inference_config))
    (a2m, a2m_params), (a2p, a2p_params) = load_audio_models(audio_cfg)
    pipe = load_pipeline(config)

    def audio2video(
        input_audio, ref_img, headpose_video=None, size=512, steps=25,
        length=150, seed=42,
    ):
        import cv2

        from aniportrait_tpu.utils.audio_util import prepare_audio_feature
        from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
        from aniportrait_tpu.utils.mp_utils import LMKExtractor
        from aniportrait_tpu.utils.pose_util import project_points
        from aniportrait_tpu.utils.util import crop_face, mux_audio, write_video
        import jax.numpy as jnp

        lmk_extractor = LMKExtractor()
        vis = FaceMeshVisualizer(forehead_edge=False)

        bgr = cv2.cvtColor(np.array(ref_img), cv2.COLOR_RGB2BGR)
        cropped = crop_face(bgr, lmk_extractor)
        if cropped is None:
            return None, ref_img
        ref_bgr = cv2.resize(cropped, (size, size))
        ref_rgb = cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB)
        face_result = lmk_extractor(ref_bgr)
        if face_result is None:
            return None, ref_img
        lmks = np.array(face_result["lmks"]).astype(np.float32)
        ref_pose = vis.draw_landmarks((size, size), lmks, normed=True)

        sample = prepare_audio_feature(input_audio, fps=30)
        seq_len = sample["seq_len"]
        pred = a2m.apply(
            {"params": a2m_params}, jnp.asarray(sample["audio_feature"])[None], seq_len
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
                a2p, a2p_params, sample["audio_feature"], seq_len,
                id_seed=random.randint(0, 99),
            )

        projected = project_points(
            pred, np.array(face_result["trans_mat"]), pose_seq, [size, size]
        )
        pose_images = [
            vis.draw_landmarks((size, size), v, normed=False) for v in projected
        ]
        L = min(length, len(pose_images))
        video = pipe(ref_rgb, pose_images[:L], ref_pose, size, size, L, steps, 3.5,
                     seed=seed)

        out_dir = "output/gradio"
        os.makedirs(out_dir, exist_ok=True)
        stamp = datetime.now().strftime("%H%M%S")
        noaudio = f"{out_dir}/a2v_{stamp}_noaudio.mp4"
        write_video([(f * 255).astype(np.uint8) for f in video], noaudio, fps=30)
        final = noaudio.replace("_noaudio.mp4", ".mp4")
        if mux_audio(noaudio, input_audio, final):
            os.remove(noaudio)
            return final, ref_rgb
        return noaudio, ref_rgb

    def video2video(ref_img, source_video, size=512, steps=25, length=150, seed=42):
        import cv2

        from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
        from aniportrait_tpu.utils.mp_utils import LMKExtractor
        from aniportrait_tpu.utils.util import (
            crop_face,
            get_fps,
            mux_audio,
            read_frames,
            write_video,
        )
        from scripts.vid2vid import retarget_pose_and_expression

        lmk_extractor = LMKExtractor()
        vis = FaceMeshVisualizer(forehead_edge=False)

        bgr = cv2.cvtColor(np.array(ref_img), cv2.COLOR_RGB2BGR)
        cropped = crop_face(bgr, lmk_extractor)
        if cropped is None:
            return None, ref_img
        ref_bgr = cv2.resize(cropped, (size, size))
        ref_rgb = cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB)
        face_result = lmk_extractor(ref_bgr)
        if face_result is None:
            return None, ref_img
        lmks = np.array(face_result["lmks"]).astype(np.float32)
        ref_pose = vis.draw_landmarks((size, size), lmks, normed=True)

        frames = read_frames(source_video)
        fps = get_fps(source_video)
        step = 2 if fps == 60 else 1
        results = []
        shape = frames[0].shape[:2]
        for f in frames[:: step][:length]:
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
        video = pipe(ref_rgb, pose_images, ref_pose, size, size, L, steps, 3.5,
                     seed=seed)

        out_dir = "output/gradio"
        os.makedirs(out_dir, exist_ok=True)
        stamp = datetime.now().strftime("%H%M%S")
        noaudio = f"{out_dir}/v2v_{stamp}_noaudio.mp4"
        write_video([(f * 255).astype(np.uint8) for f in video], noaudio, fps=30)
        final = noaudio.replace("_noaudio.mp4", ".mp4")
        if mux_audio(noaudio, source_video, final):
            os.remove(noaudio)
            return final, ref_rgb
        return noaudio, ref_rgb

    with gr.Blocks() as demo:
        gr.Markdown("# AniPortrait-TPU")
        with gr.Tab("Audio2Video"):
            with gr.Row():
                a_audio = gr.Audio(type="filepath", label="Input audio")
                a_img = gr.Image(label="Reference image")
                a_pose = gr.Video(label="Head-pose reference video (optional)")
            a_btn = gr.Button("Generate")
            a_out = gr.Video(label="Result")
            a_ref = gr.Image(label="Cropped reference")
            a_btn.click(audio2video, [a_audio, a_img, a_pose], [a_out, a_ref])
        with gr.Tab("Video2Video"):
            with gr.Row():
                v_img = gr.Image(label="Reference image")
                v_src = gr.Video(label="Source video")
            v_btn = gr.Button("Generate")
            v_out = gr.Video(label="Result")
            v_ref = gr.Image(label="Cropped reference")
            v_btn.click(video2video, [v_img, v_src], [v_out, v_ref])
    return demo


if __name__ == "__main__":
    build_app().launch()
