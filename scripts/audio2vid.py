"""Audio-driven generation CLI (the flagship path).

Parity target: reference ``scripts/audio2vid.py`` — audio -> wav2vec
features -> Audio2Mesh vertex offsets added to the reference's neutral mesh;
head pose from a template .npy (mirrored + tiled) or Audio2Pose in 5-second
chunks (last chunk merged, rotation x0.5, smoothing window 7); mesh
projected through the reference's trans_mat; pose maps drawn; diffusion;
optional FiLM -acc; audio remuxed with ffmpeg.
"""

from __future__ import annotations

import argparse
import random
from datetime import datetime
from pathlib import Path

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./configs/prompts/animation_audio.yaml")
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


def generate_head_pose(
    a2p, a2p_params, audio_feature: np.ndarray, seq_len: int, id_seed: int
) -> np.ndarray:
    """Audio2Pose in 5-s chunks with last-chunk merge (audio2vid.py:171-197)."""
    import jax.numpy as jnp

    sr, fps, chunk_duration = 16000, 30, 5
    chunk_size = sr * chunk_duration
    audio_chunks = [
        audio_feature[i : i + chunk_size]
        for i in range(0, len(audio_feature), chunk_size)
    ]
    seq_len_list = [chunk_duration * fps] * (len(audio_chunks) - 1) + [
        seq_len % (chunk_duration * fps)
    ]
    if len(audio_chunks) > 1:
        audio_chunks[-2] = np.concatenate([audio_chunks[-2], audio_chunks[-1]])
        seq_len_list[-2] = seq_len_list[-2] + seq_len_list[-1]
        del audio_chunks[-1]
        del seq_len_list[-1]

    # Every chunk except the (merged) last is exactly chunk_size samples and
    # chunk_duration*fps frames, so they run as ONE batched apply — the
    # computation is batch-independent (per-sample norms/attention), so the
    # per-chunk outputs are identical to the reference's sequential loop
    # (audio2vid.py:188-193) while the AR decode runs all chunks in parallel
    # (2 compiles total — head batch + tail — instead of one dispatch per
    # 5 s of audio).
    pose_seq = []
    if len(audio_chunks) > 1:
        head = np.stack(audio_chunks[:-1])  # (k-1, chunk_size)
        out = a2p.apply(
            {"params": a2p_params},
            jnp.asarray(head),
            int(seq_len_list[0]),
            jnp.full((head.shape[0],), id_seed, jnp.int32),
        )
        pose_seq.extend(np.array(out))  # copy: damped in place below
    tail = a2p.apply(
        {"params": a2p_params},
        jnp.asarray(audio_chunks[-1])[None],
        int(seq_len_list[-1]),
        jnp.asarray([id_seed]),
    )
    # np.array (copy): on the CPU backend np.asarray of a jax array is a
    # zero-copy READ-ONLY view and the in-place damping would raise
    pose_seq.append(np.array(tail)[0])
    for chunk in pose_seq:
        chunk[:, :3] *= 0.5  # rotation damping (audio2vid.py:193)
    from aniportrait_tpu.utils.pose_util import smooth_pose_seq

    return smooth_pose_seq(np.concatenate(pose_seq, 0), 7)


def main():
    import cv2
    import jax.numpy as jnp

    from aniportrait_tpu.config import load_config
    from aniportrait_tpu.utils.audio_util import prepare_audio_feature
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.frame_interpolation import (
        batch_images_interpolation_tool,
        init_for_cli,
    )
    from aniportrait_tpu.utils.mp_utils import LMKExtractor
    from aniportrait_tpu.utils.pose_util import project_points
    from aniportrait_tpu.utils.util import mux_audio, save_videos_grid
    from scripts.loader import load_audio_models, load_pipeline

    args = parse_args()
    config = load_config(args.config)
    audio_cfg = load_config(str(config.audio_inference_config))

    (a2m, a2m_params), (a2p, a2p_params) = load_audio_models(audio_cfg)
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
    frame_inter_model = init_for_cli(args.fi_weights) if args.accelerate else None

    # host prep for every case first; the multi-case run then pipelines
    # uploads/downloads against denoise (Pose2VideoPipeline.run_cases —
    # the reference loop is fully synchronous, scripts/audio2vid.py:142-265)
    cases, metas = [], []
    for ref_image_path in config["test_cases"].keys():
        for audio_path in config["test_cases"][ref_image_path]:
            ref_name = Path(ref_image_path).stem
            audio_name = Path(audio_path).stem

            ref_rgb = cv2.cvtColor(cv2.imread(ref_image_path), cv2.COLOR_BGR2RGB)
            ref_bgr = cv2.resize(
                cv2.cvtColor(ref_rgb, cv2.COLOR_RGB2BGR), (args.H, args.W)
            )
            face_result = lmk_extractor(ref_bgr)
            assert face_result is not None, "No face detected."
            lmks = np.array(face_result["lmks"]).astype(np.float32)
            ref_pose = vis.draw_landmarks(
                (ref_bgr.shape[1], ref_bgr.shape[0]), lmks, normed=True
            )

            sample = prepare_audio_feature(audio_path, fps=args.fps)
            seq_len = sample["seq_len"]

            # audio -> mesh offsets + neutral mesh
            pred = a2m.apply(
                {"params": a2m_params},
                jnp.asarray(sample["audio_feature"])[None],
                seq_len,
            )
            pred = np.asarray(pred)[0].reshape(seq_len, -1, 3)
            pred = pred + np.array(face_result["lmks3d"])

            # head pose: template or Audio2Pose
            if config.get("pose_temp"):
                pose_seq = np.load(str(config.pose_temp))
                mirrored = np.concatenate((pose_seq, pose_seq[-2:0:-1]), axis=0)
                pose_seq = np.tile(mirrored, (seq_len // len(mirrored) + 1, 1))[
                    :seq_len
                ]
            else:
                pose_seq = generate_head_pose(
                    a2p, a2p_params, sample["audio_feature"], seq_len,
                    id_seed=random.randint(0, 99),
                )

            projected = project_points(
                pred, np.array(face_result["trans_mat"]), pose_seq, [height, width]
            )
            pose_images = [
                vis.draw_landmarks((width, height), verts, normed=False)
                for verts in projected
            ]

            L = len(pose_images) if args.L is None else args.L
            sub_step = args.fi_step if args.accelerate else 1
            pose_list = [
                cv2.resize(p, (width, height)) for p in pose_images[:L:sub_step]
            ]
            video_length = len(pose_list)

            cases.append(dict(
                ref_image=ref_rgb, pose_images=pose_list,
                ref_pose_image=ref_pose, key=len(cases),
                kw=dict(video_length=video_length),
            ))
            metas.append(dict(
                ref_name=ref_name, audio_name=audio_name, ref_rgb=ref_rgb,
                pose_images=pose_images, audio_path=audio_path,
            ))

    def write_one(meta, video):
        ref_row = np.repeat(
            (cv2.resize(meta["ref_rgb"], (width, height)).astype(np.float32)
             / 255)[None],
            video.shape[0], axis=0,
        )
        pose_row = np.stack(
            [p.astype(np.float32) / 255
             for p in meta["pose_images"][: video.shape[0]]]
        )
        grid = np.stack([ref_row, pose_row[: video.shape[0]], video])

        noaudio_path = (
            f"{save_dir}/{meta['ref_name']}_{meta['audio_name']}"
            f"_{args.H}x{args.W}_{int(args.cfg)}_{time_str}_noaudio.mp4"
        )
        save_videos_grid(grid, noaudio_path, fps=args.fps)
        final = noaudio_path.replace("_noaudio.mp4", ".mp4")
        if mux_audio(noaudio_path, meta["audio_path"], final):
            import os

            os.remove(noaudio_path)
            print(f"saved {final}")
        else:
            print(f"saved {noaudio_path} (no ffmpeg for audio mux)")

    if args.accelerate:
        # under -acc with a device-capable interpolator the clip stays on
        # device between diffusion and FiLM (uint8 host round trips of the
        # clip otherwise dominate on remote-attached chips) — serial path
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
