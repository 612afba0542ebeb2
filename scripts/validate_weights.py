"""Weights-arrival validation CLI: one command proving the downloaded
checkpoint zoo converts loss-lessly into this framework.

    python -m scripts.validate_weights --config configs/prompts/animation.yaml \
        [--audio-config configs/prompts/animation_audio.yaml] [--film path.pt]

For every checkpoint the prompt config points at (the reference's weight
contract, README.md:100-145), runs the converter and asserts strict key/shape
bijection against the full-size flax trees.  Exit code 0 = every family
converts with zero unconsumed keys, zero unfilled params, exact shapes.
See docs/WEIGHTS_RUNBOOK.md for the full arrival-day procedure.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="prompt YAML (animation.yaml shape)")
    ap.add_argument("--audio-config", default=None,
                    help="audio prompt YAML (animation_audio.yaml shape)")
    ap.add_argument("--film", default=None, help="film_net TorchScript .pt")
    args = ap.parse_args(argv)

    from aniportrait_tpu.config import load_config
    from aniportrait_tpu.weights.convert import (
        convert_audio2mesh,
        convert_audio2pose,
        convert_clip_vision,
        convert_film,
        convert_pose_guider,
        convert_unet,
        convert_vae,
        load_torch_state_dict,
    )
    from aniportrait_tpu.weights.validate import check_bijection, fullsize_model_trees
    from scripts.loader import _find_weights

    cfg = load_config(args.config)
    trees = fullsize_model_trees()
    problems: list[str] = []

    def run(family, sd, convert, tree, **kw):
        before = len(problems)  # per-family status, not the global tally
        converted, unused = convert(sd, **kw)
        if family == "reference_unet":
            head = {"conv_norm_out.weight", "conv_norm_out.bias",
                    "conv_out.weight", "conv_out.bias"}
            unused = [k for k in unused if k not in head]
        if unused:
            problems.append(
                f"{family}: {len(unused)} torch keys NOT consumed, e.g. {unused[:5]}"
            )
        problems.extend(check_bijection(converted, tree, family))
        status = "OK" if len(problems) == before else "see problems"
        print(f"checked {family}: {status}")
        return converted

    vae_sd = load_torch_state_dict(_find_weights(str(cfg.pretrained_vae_path)))
    run("vae", vae_sd, convert_vae, trees["vae"])

    clip_sd = load_torch_state_dict(_find_weights(str(cfg.image_encoder_path)))
    run("clip", clip_sd, convert_clip_vision, trees["clip"])

    base_sd = load_torch_state_dict(
        _find_weights(str(cfg.pretrained_base_model_path), "unet")
    )
    ref_sd = dict(base_sd)
    ref_sd.update(load_torch_state_dict(str(cfg.reference_unet_path)))
    run("reference_unet", ref_sd, convert_unet, trees["reference_unet"],
        has_output_head=False)

    den_sd = dict(base_sd)
    if cfg.get("motion_module_path"):
        den_sd.update(load_torch_state_dict(str(cfg.motion_module_path)))
    den_sd.update(load_torch_state_dict(str(cfg.denoising_unet_path)))
    run("denoising_unet", den_sd, convert_unet, trees["denoising_unet"],
        has_output_head=True)

    pg_sd = load_torch_state_dict(str(cfg.pose_guider_path))
    run("pose_guider", pg_sd, convert_pose_guider, trees["pose_guider"])

    if args.audio_config:
        acfg = load_config(args.audio_config)
        audio_cfg = load_config(str(acfg.audio_inference_config)) \
            if acfg.get("audio_inference_config") else acfg
        a2m_sd = load_torch_state_dict(str(audio_cfg.pretrained_model.a2m_ckpt))
        a2m_tree = trees["audio2mesh"]
        if not any(k.startswith("audio_encoder.") for k in a2m_sd):
            a2m_tree = {k: v for k, v in a2m_tree.items() if k != "audio_encoder"}
        conv_m, unused_m = convert_audio2mesh(a2m_sd)
        if "audio_encoder" not in a2m_tree:
            conv_m.pop("audio_encoder", None)
        if unused_m:
            problems.append(f"audio2mesh: unconsumed {unused_m[:5]}")
        problems.extend(check_bijection(conv_m, a2m_tree, "audio2mesh"))
        print("checked audio2mesh")

        a2p_sd = load_torch_state_dict(str(audio_cfg.pretrained_model.a2p_ckpt))
        a2p_tree = trees["audio2pose"]
        if not any(k.startswith("audio_encoder.") for k in a2p_sd):
            a2p_tree = {k: v for k, v in a2p_tree.items() if k != "audio_encoder"}
        conv_p, unused_p = convert_audio2pose(a2p_sd)
        if "audio_encoder" not in a2p_tree:
            conv_p.pop("audio_encoder", None)
        if unused_p:
            problems.append(f"audio2pose: unconsumed {unused_p[:5]}")
        problems.extend(check_bijection(conv_p, a2p_tree, "audio2pose"))
        print("checked audio2pose")

    if args.film:
        import torch

        ts = torch.jit.load(args.film, map_location="cpu")
        _, unused_f = convert_film({k: v for k, v in ts.state_dict().items()})
        if unused_f:
            problems.append(
                f"film: {len(unused_f)} TorchScript keys NOT consumed, e.g. "
                f"{unused_f[:5]} — the dajes blob layout differs from the "
                "documented assumption; extend weights/convert.py:film_rules"
            )
        print("checked film")

    if problems:
        print("\nVALIDATION FAILED:")
        for p in problems:
            print(" -", p)
        return 1
    print("\nall checkpoint families convert with strict bijection — OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
