"""Pose-video-driven generation CLI.

Parity target: reference ``scripts/pose2vid.py`` — flags -W/-H/-L/--seed/
--cfg/--steps/--fps/-acc/--fi_step, prompt YAML with ``test_cases`` mapping
ref image -> pose videos; writes a 3-row (ref/pose/result) grid mp4.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from pathlib import Path

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./configs/prompts/animation.yaml")
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
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("-acc", "--accelerate", action="store_true")
    parser.add_argument("--fi_step", type=int, default=3)
    parser.add_argument("--fi_weights", type=str, default=None,
                        help="FiLM net weights (.pt TorchScript or converted .npz)")
    return parser.parse_args()


def main():
    import cv2

    from aniportrait_tpu.config import load_config
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.frame_interpolation import (
        batch_images_interpolation_tool,
        init_for_cli,
    )
    from aniportrait_tpu.utils.mp_utils import LMKExtractor
    from aniportrait_tpu.utils.util import get_fps, read_frames, save_videos_grid
    from scripts.loader import load_pipeline

    args = parse_args()
    config = load_config(args.config)
    pipe = load_pipeline(config, encoder_cache_interval=args.encoder_cache,
                         window_fusion=args.window_fusion,
                         context_rotate=args.context_rotate,
                         force_approx=args.force_approx)

    date_str = datetime.now().strftime("%Y%m%d")
    time_str = datetime.now().strftime("%H%M")
    save_dir = Path(f"output/{date_str}/{time_str}--seed_{args.seed}-{args.W}x{args.H}")
    save_dir.mkdir(exist_ok=True, parents=True)

    lmk_extractor = LMKExtractor()
    vis = FaceMeshVisualizer(forehead_edge=False)
    frame_inter_model = (
        init_for_cli(args.fi_weights) if args.accelerate else None
    )

    # host-side prep for every test case up front, so the multi-case run
    # can pipeline: case i+1's upload and case i-1's download overlap case
    # i's denoise (Pose2VideoPipeline.run_cases; the reference's loop is
    # fully synchronous, scripts/pose2vid.py:136-207)
    cases, metas = [], []
    for ref_image_path in config["test_cases"].keys():
        for pose_video_path in config["test_cases"][ref_image_path]:
            ref_name = Path(ref_image_path).stem
            pose_name = Path(pose_video_path).stem.replace("_kps", "")

            ref_rgb = cv2.cvtColor(cv2.imread(ref_image_path), cv2.COLOR_BGR2RGB)
            ref_bgr = cv2.resize(cv2.cvtColor(ref_rgb, cv2.COLOR_RGB2BGR), (args.H, args.W))
            face_result = lmk_extractor(ref_bgr)
            assert face_result is not None, "No face detected."
            lmks = np.array(face_result["lmks"]).astype(np.float32)
            ref_pose = vis.draw_landmarks(
                (ref_bgr.shape[1], ref_bgr.shape[0]), lmks, normed=True
            )

            pose_frames = read_frames(pose_video_path)
            src_fps = get_fps(pose_video_path)
            sub_step = args.fi_step if args.accelerate else 1
            L = len(pose_frames) if args.L is None else args.L
            pose_list = [
                cv2.resize(f, (args.W, args.H)) for f in pose_frames[:L:sub_step]
            ]
            cases.append(dict(
                ref_image=ref_rgb, pose_images=pose_list,
                ref_pose_image=ref_pose, key=len(cases),
                kw=dict(video_length=len(pose_list)),
            ))
            metas.append(dict(
                ref_name=ref_name, pose_name=pose_name, ref_rgb=ref_rgb,
                pose_list=pose_list, src_fps=src_fps,
                pose_frames=pose_frames if args.accelerate else None,
            ))

    def write_one(meta, video):
        ref_row = np.repeat(
            (cv2.resize(meta["ref_rgb"], (args.W, args.H)).astype(np.float32)
             / 255)[None],
            video.shape[0],
            axis=0,
        )
        pose_row = (
            np.stack(
                [
                    cv2.resize(f, (args.W, args.H)).astype(np.float32) / 255
                    for f in meta["pose_frames"][: video.shape[0]]
                ]
            )
            if args.accelerate
            else np.stack(
                [p.astype(np.float32) / 255 for p in meta["pose_list"]]
            )
        )[: video.shape[0]]
        grid = np.stack([ref_row, pose_row, video])

        save_path = (
            f"{save_dir}/{meta['ref_name']}_{meta['pose_name']}"
            f"_{args.H}x{args.W}_{int(args.cfg)}_{time_str}.mp4"
        )
        save_videos_grid(
            grid, save_path,
            fps=meta["src_fps"] if args.L is None else args.fps,
        )
        print(f"saved {save_path}")

    if args.accelerate:
        # FiLM consumes the device output directly; keep this path serial
        on_device = getattr(frame_inter_model, "device_io", False)
        for case, meta in zip(cases, metas):
            video = pipe(
                case["ref_image"], case["pose_images"],
                case["ref_pose_image"], args.W, args.H,
                case["kw"]["video_length"], args.steps, args.cfg,
                seed=args.seed, return_device=on_device,
            )
            video = batch_images_interpolation_tool(
                video, frame_inter_model, inter_frames=args.fi_step - 1
            )[0]
            write_one(meta, video)
    else:
        for key, video in pipe.run_cases(
            cases, args.W, args.H, num_inference_steps=args.steps,
            guidance_scale=args.cfg, seed=args.seed,
        ):
            write_one(metas[key], video)


if __name__ == "__main__":
    main()
