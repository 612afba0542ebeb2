"""Face reenactment CLI (video -> video with pose/expression retargeting).

Parity target: reference ``scripts/vid2vid.py`` — per source frame extract
trans_mat/lmks3d/blendshapes; retarget pose (euler-decompose, replace
absolute translation with ref-relative, smooth w=3, recompose) and
expression (delta vs the most-neutral source frame added to the reference's
neutral mesh); project with per-frame transforms; draw; diffuse; remux audio.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from pathlib import Path

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./configs/prompts/animation_facereenac.yaml")
    parser.add_argument("-W", type=int, default=512)
    parser.add_argument("-H", type=int, default=512)
    parser.add_argument("-L", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--cfg", type=float, default=3.5)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument(
        "--encoder_cache", type=int, default=1,
        help="refresh UNet down/mid features every k-th denoise step "
             "(k>1 is a documented approximation ~35-45%% faster denoise; "
             "gate with scripts/quality_gate.py)",
    )
    parser.add_argument(
        "--window_fusion", action="store_true",
        help="opt-in overlap-aware long-clip mode: one whole-clip "
             "UNet pass per step, motion modules window internally "
             "(quality-gated approximation; "
             "scripts/quality_speed_gate.py)",
    )
    parser.add_argument(
        "--context_rotate", action="store_true",
        help="rotate the context window table per denoise step (opt-in "
             "quality experiment; NOT reference behavior — gated by the "
             "measured table in docs/, utils/quality_gate.py)")
    parser.add_argument(
        "--force_approx", action="store_true",
        help="run approximations past the measured quality gate "
             "(utils/quality_gate.py refuses encoder cache k>=3 "
             "without this)",
    )
    parser.add_argument("--fps", type=int, default=None)
    parser.add_argument("-acc", "--accelerate", action="store_true")
    parser.add_argument("--fi_step", type=int, default=3)
    return parser.parse_args()


def retarget_pose_and_expression(
    source_results: list, ref_result: dict, frame_shape, smooth_window: int = 3
):
    """The vid2vid retargeting math (reference vid2vid.py:174-197).

    Returns projected 2D vertices (L, N, 2) for the target pose images."""
    from aniportrait_tpu.utils.pose_util import (
        euler_and_translation_to_matrix,
        matrix_to_euler_and_translation,
        project_points_with_trans,
        smooth_pose_seq,
    )

    trans_mat_arr = np.array([r["trans_mat"] for r in source_results])
    verts_arr = np.array([r["lmks3d"] for r in source_results])
    bs_arr = np.array([r["bs"] for r in source_results])
    min_bs_idx = np.argmin(bs_arr.sum(1))

    pose_arr = np.zeros([trans_mat_arr.shape[0], 6])
    for i in range(pose_arr.shape[0]):
        euler, trans = matrix_to_euler_and_translation(trans_mat_arr[i])
        pose_arr[i, :3] = euler
        pose_arr[i, 3:6] = trans

    init_tran_vec = np.array(ref_result["trans_mat"])[:3, 3]
    pose_arr[:, 3:6] = pose_arr[:, 3:6] - pose_arr[0, 3:6] + init_tran_vec

    pose_arr_smooth = smooth_pose_seq(pose_arr, window_size=smooth_window)
    pose_mat_smooth = np.array(
        [
            euler_and_translation_to_matrix(
                pose_arr_smooth[i][:3], pose_arr_smooth[i][3:6]
            )
            for i in range(pose_arr_smooth.shape[0])
        ]
    )

    verts_arr = verts_arr - verts_arr[min_bs_idx] + np.array(ref_result["lmks3d"])
    return project_points_with_trans(verts_arr, pose_mat_smooth, frame_shape)


def main():
    import cv2

    from aniportrait_tpu.config import load_config
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.frame_interpolation import (
        batch_images_interpolation_tool,
        init_frame_interpolation_model,
    )
    from aniportrait_tpu.utils.mp_utils import LMKExtractor
    from aniportrait_tpu.utils.util import (
        get_fps,
        mux_audio,
        read_frames,
        save_videos_grid,
    )
    from scripts.loader import load_pipeline

    args = parse_args()
    config = load_config(args.config)
    pipe = load_pipeline(config, encoder_cache_interval=args.encoder_cache,
                         window_fusion=args.window_fusion,
                         context_rotate=args.context_rotate,
                         force_approx=args.force_approx)

    width, height = args.W, args.H
    date_str = datetime.now().strftime("%Y%m%d")
    time_str = datetime.now().strftime("%H%M")
    save_dir = Path(f"output/{date_str}/{time_str}--seed_{args.seed}-{args.W}x{args.H}")
    save_dir.mkdir(exist_ok=True, parents=True)

    lmk_extractor = LMKExtractor()
    vis = FaceMeshVisualizer(forehead_edge=False)
    frame_inter_model = init_frame_interpolation_model() if args.accelerate else None

    # host prep for every case first; the multi-case run then pipelines
    # uploads/downloads against denoise (Pose2VideoPipeline.run_cases —
    # the reference loop is fully synchronous, scripts/vid2vid.py:199-254)
    test_cases = config["test_cases"]
    cases, metas = [], []
    for ref_image_path in test_cases.keys():
        for source_video_path in test_cases[ref_image_path]:
            ref_name = Path(ref_image_path).stem
            pose_name = Path(source_video_path).stem

            ref_rgb = cv2.cvtColor(cv2.imread(ref_image_path), cv2.COLOR_BGR2RGB)
            ref_bgr = cv2.resize(
                cv2.cvtColor(ref_rgb, cv2.COLOR_RGB2BGR), (args.H, args.W)
            )
            face_result = lmk_extractor(ref_bgr)
            assert face_result is not None, "No face in the reference image."
            lmks = np.array(face_result["lmks"]).astype(np.float32)
            ref_pose = vis.draw_landmarks(
                (ref_bgr.shape[1], ref_bgr.shape[0]), lmks, normed=True
            )

            source_images = read_frames(source_video_path)
            src_fps = get_fps(source_video_path)
            step = 1
            if src_fps == 60:
                src_fps, step = 30, 2

            args_L = len(source_images) if args.L is None else args.L * step
            sub_step = step * args.fi_step if args.accelerate else step
            source_results = []
            frame_shape = source_images[0].shape[:2]
            for src_rgb in source_images[:args_L:sub_step]:
                src_bgr = cv2.cvtColor(src_rgb, cv2.COLOR_RGB2BGR)
                frame_shape = src_bgr.shape[:2]
                res = lmk_extractor(src_bgr)
                if res is None:
                    break
                source_results.append(res)

            projected = retarget_pose_and_expression(
                source_results, face_result, list(frame_shape)
            )
            pose_list = [
                cv2.resize(
                    vis.draw_landmarks(
                        (frame_shape[1], frame_shape[0]), verts, normed=False
                    ),
                    (width, height),
                )
                for verts in projected
            ]
            cases.append(dict(
                ref_image=ref_rgb, pose_images=pose_list,
                ref_pose_image=ref_pose, key=len(cases),
                kw=dict(video_length=len(pose_list)),
            ))
            metas.append(dict(
                ref_name=ref_name, pose_name=pose_name, ref_rgb=ref_rgb,
                src_fps=src_fps, source_video_path=source_video_path,
                src_frames=source_images[:args_L:step],
            ))

    def write_one(meta, video):
        ref_row = np.repeat(
            (cv2.resize(meta["ref_rgb"], (width, height)).astype(np.float32)
             / 255)[None],
            video.shape[0], axis=0,
        )
        src_row = np.stack(
            [
                cv2.resize(f, (width, height)).astype(np.float32) / 255
                for f in meta["src_frames"][: video.shape[0]]
            ]
        )
        grid = np.stack([ref_row, video, src_row[: video.shape[0]]])

        noaudio = (
            f"{save_dir}/{meta['ref_name']}_{meta['pose_name']}"
            f"_{args.H}x{args.W}_{int(args.cfg)}_{time_str}_noaudio.mp4"
        )
        save_videos_grid(
            grid, noaudio,
            fps=meta["src_fps"] if args.fps is None else args.fps,
        )
        final = noaudio.replace("_noaudio.mp4", ".mp4")
        if mux_audio(noaudio, meta["source_video_path"], final):
            os.remove(noaudio)
            print(f"saved {final}")
        else:
            print(f"saved {noaudio} (no ffmpeg for audio mux)")

    if args.accelerate:
        # FiLM consumes the device output directly; keep this path serial
        on_device = getattr(frame_inter_model, "device_io", False)
        for case, meta in zip(cases, metas):
            video = pipe(
                case["ref_image"], case["pose_images"],
                case["ref_pose_image"], width, height,
                case["kw"]["video_length"], args.steps, args.cfg,
                seed=args.seed, return_device=on_device,
            )
            video = batch_images_interpolation_tool(
                video, frame_inter_model, inter_frames=args.fi_step - 1
            )[0]
            write_one(meta, video)
    else:
        for key, video in pipe.run_cases(
            cases, width, height, num_inference_steps=args.steps,
            guidance_scale=args.cfg, seed=args.seed,
        ):
            write_one(metas[key], video)


if __name__ == "__main__":
    main()
