"""Procedural generators of the COMPLETE torch state-dict {key: shape} sets
for every checkpoint family in the reference's weight contract
(reference README.md:100-145: SD-1.5 UNet, sd-vae-ft-mse, CLIP image encoder,
wav2vec2-base-960h, denoising_unet/reference_unet/pose_guider/motion_module
.pth, audio2mesh.pt, audio2pose.pt).

Naming sources (deliberately NOT our converter — that would be circular):
  * SD-1.5 UNet / VAE: the diffusers 0.24 module trees the reference vendors
    (reference src/models/unet_2d_condition.py, unet_3d.py:44-58, and the
    diffusers AutoencoderKL the reference loads at scripts/pose2vid.py:59-76).
  * Motion module: reference src/models/motion_module.py (AnimateDiff
    mm_sd_v15_v2 layout, PE max_len 32 per configs/inference/inference_v2.yaml).
  * Pose guider: reference src/models/pose_guider.py:19-122 (stem channel
    ladder 3-3-16-16-32-32-64-64-128, per-scale Transformer2DModel with the
    diffusers default inner dim 16*88=1408).
  * CLIP / wav2vec2: real transformers modules instantiated on the meta
    device (zero memory) — the exact key sets of the published checkpoints.
  * audio2mesh/audio2pose: reference src/audio_models/{model,pose_model}.py
    (wav2vec2 encoder + linear heads; 8-layer torch TransformerDecoder).
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]

TIME_DIM = 1280


def _resnet(prefix: str, cin: int, cout: int, time_emb: bool = True) -> Dict[str, Shape]:
    sd = {
        f"{prefix}.norm1.weight": (cin,), f"{prefix}.norm1.bias": (cin,),
        f"{prefix}.conv1.weight": (cout, cin, 3, 3), f"{prefix}.conv1.bias": (cout,),
        f"{prefix}.norm2.weight": (cout,), f"{prefix}.norm2.bias": (cout,),
        f"{prefix}.conv2.weight": (cout, cout, 3, 3), f"{prefix}.conv2.bias": (cout,),
    }
    if time_emb:
        sd[f"{prefix}.time_emb_proj.weight"] = (cout, TIME_DIM)
        sd[f"{prefix}.time_emb_proj.bias"] = (cout,)
    if cin != cout:
        sd[f"{prefix}.conv_shortcut.weight"] = (cout, cin, 1, 1)
        sd[f"{prefix}.conv_shortcut.bias"] = (cout,)
    return sd


def _spatial_transformer(prefix: str, ch: int, cross: int = 768) -> Dict[str, Shape]:
    """diffusers Transformer2DModel at SD-1.5 settings (conv 1x1 projections,
    1 BasicTransformerBlock, GEGLU ff)."""
    blk = f"{prefix}.transformer_blocks.0"
    return {
        f"{prefix}.norm.weight": (ch,), f"{prefix}.norm.bias": (ch,),
        f"{prefix}.proj_in.weight": (ch, ch, 1, 1), f"{prefix}.proj_in.bias": (ch,),
        f"{prefix}.proj_out.weight": (ch, ch, 1, 1), f"{prefix}.proj_out.bias": (ch,),
        f"{blk}.norm1.weight": (ch,), f"{blk}.norm1.bias": (ch,),
        f"{blk}.attn1.to_q.weight": (ch, ch),
        f"{blk}.attn1.to_k.weight": (ch, ch),
        f"{blk}.attn1.to_v.weight": (ch, ch),
        f"{blk}.attn1.to_out.0.weight": (ch, ch), f"{blk}.attn1.to_out.0.bias": (ch,),
        f"{blk}.norm2.weight": (ch,), f"{blk}.norm2.bias": (ch,),
        f"{blk}.attn2.to_q.weight": (ch, ch),
        f"{blk}.attn2.to_k.weight": (ch, cross),
        f"{blk}.attn2.to_v.weight": (ch, cross),
        f"{blk}.attn2.to_out.0.weight": (ch, ch), f"{blk}.attn2.to_out.0.bias": (ch,),
        f"{blk}.norm3.weight": (ch,), f"{blk}.norm3.bias": (ch,),
        f"{blk}.ff.net.0.proj.weight": (ch * 8, ch), f"{blk}.ff.net.0.proj.bias": (ch * 8,),
        f"{blk}.ff.net.2.weight": (ch, ch * 4), f"{blk}.ff.net.2.bias": (ch,),
    }


def sd15_unet_keys() -> Dict[str, Shape]:
    """stable-diffusion-v1-5/unet diffusion_pytorch_model state dict:
    block_out (320, 640, 1280, 1280), 2 layers/block, heads 8, cross 768
    (reference unet_3d.py:44-58 mirrors this shape for from_pretrained_2d)."""
    ch = (320, 640, 1280, 1280)
    sd: Dict[str, Shape] = {
        "conv_in.weight": (320, 4, 3, 3), "conv_in.bias": (320,),
        "time_embedding.linear_1.weight": (TIME_DIM, 320),
        "time_embedding.linear_1.bias": (TIME_DIM,),
        "time_embedding.linear_2.weight": (TIME_DIM, TIME_DIM),
        "time_embedding.linear_2.bias": (TIME_DIM,),
        "conv_norm_out.weight": (320,), "conv_norm_out.bias": (320,),
        "conv_out.weight": (4, 320, 3, 3), "conv_out.bias": (4,),
    }
    # down blocks: CrossAttn x3 + plain DownBlock2D
    for i in range(4):
        cin = ch[max(i - 1, 0)]
        cout = ch[i]
        p = f"down_blocks.{i}"
        sd.update(_resnet(f"{p}.resnets.0", cin, cout))
        sd.update(_resnet(f"{p}.resnets.1", cout, cout))
        if i < 3:
            sd.update(_spatial_transformer(f"{p}.attentions.0", cout))
            sd.update(_spatial_transformer(f"{p}.attentions.1", cout))
            sd[f"{p}.downsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            sd[f"{p}.downsamplers.0.conv.bias"] = (cout,)
    # mid
    sd.update(_resnet("mid_block.resnets.0", 1280, 1280))
    sd.update(_resnet("mid_block.resnets.1", 1280, 1280))
    sd.update(_spatial_transformer("mid_block.attentions.0", 1280))
    # up blocks: UpBlock2D + CrossAttn x3 (diffusers channel plumbing:
    # prev_output + skip concat per resnet)
    rev = ch[::-1]  # (1280, 1280, 640, 320)
    output_channel = rev[0]
    for i in range(4):
        prev_output = output_channel
        output_channel = rev[i]
        input_channel = rev[min(i + 1, 3)]
        p = f"up_blocks.{i}"
        for j in range(3):
            skip = input_channel if j == 2 else output_channel
            cin = (prev_output if j == 0 else output_channel) + skip
            sd.update(_resnet(f"{p}.resnets.{j}", cin, output_channel))
            if i > 0:
                sd.update(_spatial_transformer(f"{p}.attentions.{j}", output_channel))
        if i < 3:
            sd[f"{p}.upsamplers.0.conv.weight"] = (output_channel, output_channel, 3, 3)
            sd[f"{p}.upsamplers.0.conv.bias"] = (output_channel,)
    return sd


def _motion_module(prefix: str, ch: int, max_len: int = 32) -> Dict[str, Shape]:
    """reference motion_module.py VanillaTemporalModule: 1 temporal
    transformer block of 2 Temporal_Self attentions + GEGLU ff."""
    tt = f"{prefix}.temporal_transformer"
    blk = f"{tt}.transformer_blocks.0"
    sd = {
        f"{tt}.norm.weight": (ch,), f"{tt}.norm.bias": (ch,),
        f"{tt}.proj_in.weight": (ch, ch), f"{tt}.proj_in.bias": (ch,),
        f"{tt}.proj_out.weight": (ch, ch), f"{tt}.proj_out.bias": (ch,),
        f"{blk}.ff.net.0.proj.weight": (ch * 8, ch), f"{blk}.ff.net.0.proj.bias": (ch * 8,),
        f"{blk}.ff.net.2.weight": (ch, ch * 4), f"{blk}.ff.net.2.bias": (ch,),
        f"{blk}.ff_norm.weight": (ch,), f"{blk}.ff_norm.bias": (ch,),
    }
    for a in range(2):
        ab = f"{blk}.attention_blocks.{a}"
        sd.update({
            f"{ab}.to_q.weight": (ch, ch),
            f"{ab}.to_k.weight": (ch, ch),
            f"{ab}.to_v.weight": (ch, ch),
            f"{ab}.to_out.0.weight": (ch, ch), f"{ab}.to_out.0.bias": (ch,),
            f"{ab}.pos_encoder.pe": (1, max_len, ch),
        })
        sd[f"{blk}.norms.{a}.weight"] = (ch,)
        sd[f"{blk}.norms.{a}.bias"] = (ch,)
    return sd


def mm_sd_v15_v2_keys(max_len: int = 32) -> Dict[str, Shape]:
    """AnimateDiff mm_sd_v15_v2.ckpt overlay: motion modules at every down
    layer (2/block), every up layer (3/block) and the mid block
    (inference_v2.yaml: resolutions 1,2,4,8 + mid_block true)."""
    ch = (320, 640, 1280, 1280)
    sd: Dict[str, Shape] = {}
    for i in range(4):
        for j in range(2):
            sd.update(_motion_module(f"down_blocks.{i}.motion_modules.{j}", ch[i], max_len))
    sd.update(_motion_module("mid_block.motion_modules.0", 1280, max_len))
    rev = ch[::-1]
    for i in range(4):
        for j in range(3):
            sd.update(_motion_module(f"up_blocks.{i}.motion_modules.{j}", rev[i], max_len))
    return sd


def denoising_unet_keys() -> Dict[str, Shape]:
    """denoising_unet.pth as the reference saves it (full 3D UNet dict =
    2D SD keys + motion modules; unet_3d.py shares the 2D names so
    from_pretrained_2d can strict=False-load them)."""
    sd = sd15_unet_keys()
    sd.update(mm_sd_v15_v2_keys())
    return sd


def _vae_resnet(prefix: str, cin: int, cout: int) -> Dict[str, Shape]:
    return _resnet(prefix, cin, cout, time_emb=False)


def vae_keys() -> Dict[str, Shape]:
    """sd-vae-ft-mse AutoencoderKL: block_out (128, 256, 512, 512),
    2 encoder layers / 3 decoder layers per block, mid attention."""
    ch = (128, 256, 512, 512)
    sd: Dict[str, Shape] = {
        "encoder.conv_in.weight": (128, 3, 3, 3), "encoder.conv_in.bias": (128,),
        "encoder.conv_norm_out.weight": (512,), "encoder.conv_norm_out.bias": (512,),
        "encoder.conv_out.weight": (8, 512, 3, 3), "encoder.conv_out.bias": (8,),
        "decoder.conv_in.weight": (512, 4, 3, 3), "decoder.conv_in.bias": (512,),
        "decoder.conv_norm_out.weight": (128,), "decoder.conv_norm_out.bias": (128,),
        "decoder.conv_out.weight": (3, 128, 3, 3), "decoder.conv_out.bias": (3,),
        "quant_conv.weight": (8, 8, 1, 1), "quant_conv.bias": (8,),
        "post_quant_conv.weight": (4, 4, 1, 1), "post_quant_conv.bias": (4,),
    }
    for side in ("encoder", "decoder"):
        for j in range(2):
            sd.update(_vae_resnet(f"{side}.mid_block.resnets.{j}", 512, 512))
        a = f"{side}.mid_block.attentions.0"
        sd.update({
            f"{a}.group_norm.weight": (512,), f"{a}.group_norm.bias": (512,),
            f"{a}.to_q.weight": (512, 512), f"{a}.to_q.bias": (512,),
            f"{a}.to_k.weight": (512, 512), f"{a}.to_k.bias": (512,),
            f"{a}.to_v.weight": (512, 512), f"{a}.to_v.bias": (512,),
            f"{a}.to_out.0.weight": (512, 512), f"{a}.to_out.0.bias": (512,),
        })
    for i in range(4):  # encoder: 2 resnets + downsample (not last)
        cin = ch[max(i - 1, 0)]
        cout = ch[i]
        p = f"encoder.down_blocks.{i}"
        sd.update(_vae_resnet(f"{p}.resnets.0", cin, cout))
        sd.update(_vae_resnet(f"{p}.resnets.1", cout, cout))
        if i < 3:
            sd[f"{p}.downsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            sd[f"{p}.downsamplers.0.conv.bias"] = (cout,)
    rev = ch[::-1]
    output_channel = rev[0]
    for i in range(4):  # decoder: 3 resnets + upsample (not last)
        prev_output = output_channel
        output_channel = rev[i]
        p = f"decoder.up_blocks.{i}"
        sd.update(_vae_resnet(f"{p}.resnets.0", prev_output, output_channel))
        sd.update(_vae_resnet(f"{p}.resnets.1", output_channel, output_channel))
        sd.update(_vae_resnet(f"{p}.resnets.2", output_channel, output_channel))
        if i < 3:
            sd[f"{p}.upsamplers.0.conv.weight"] = (output_channel, output_channel, 3, 3)
            sd[f"{p}.upsamplers.0.conv.bias"] = (output_channel,)
    return sd


def pose_guider_keys(noise_latent: int = 320) -> Dict[str, Shape]:
    """pose_guider.pth (reference pose_guider.py:19-122): conv/BN stem,
    final 1x1 proj, 4 pyramid stages with per-scale cross-attention
    transformers (inner dim 16*88=1408), learnable scale."""
    nl = noise_latent
    sd: Dict[str, Shape] = {
        "final_proj.weight": (nl, 128, 1, 1), "final_proj.bias": (nl,),
        "scale": (1,),
    }

    def conv_bn(cprefix, idx, cin, cout, k):
        sd[f"{cprefix}.{idx}.weight"] = (cout, cin, k, k)
        sd[f"{cprefix}.{idx}.bias"] = (cout,)
        for stat, shape in (("weight", (cout,)), ("bias", (cout,)),
                            ("running_mean", (cout,)), ("running_var", (cout,)),
                            ("num_batches_tracked", ())):
            sd[f"{cprefix}.{idx + 1}.{stat}"] = shape

    stem = [(3, 3, 3), (3, 16, 4), (16, 16, 3), (16, 32, 4),
            (32, 32, 3), (32, 64, 4), (64, 64, 3), (64, 128, 3)]
    for n, (cin, cout, k) in enumerate(stem):
        conv_bn("conv_layers", 3 * n, cin, cout, k)

    pyramid = [((nl, nl, 3), (nl, nl, 3)),
               ((nl, nl, 3), (nl, 2 * nl, 3)),
               ((2 * nl, 2 * nl, 3), (2 * nl, 4 * nl, 3)),
               ((4 * nl, 4 * nl, 3),)]
    inner = 16 * 88  # diffusers Transformer2DModel defaults (pose_guider.py:184-186)
    ca_ch = (nl, 2 * nl, 4 * nl, 4 * nl)
    for n, convs in enumerate(pyramid, start=1):
        for j, (cin, cout, k) in enumerate(convs):
            conv_bn(f"conv_layers_{n}", 3 * j, cin, cout, k)
        ch = ca_ch[n - 1]
        ca = f"cross_attn{n}"
        blk = f"{ca}.transformer_blocks.0"
        sd.update({
            f"{ca}.norm.weight": (ch,), f"{ca}.norm.bias": (ch,),
            f"{ca}.proj_in.weight": (inner, ch, 1, 1), f"{ca}.proj_in.bias": (inner,),
            f"{ca}.proj_out.weight": (ch, inner, 1, 1), f"{ca}.proj_out.bias": (ch,),
            f"{blk}.norm1.weight": (inner,), f"{blk}.norm1.bias": (inner,),
            f"{blk}.attn1.to_q.weight": (inner, inner),
            f"{blk}.attn1.to_k.weight": (inner, inner),
            f"{blk}.attn1.to_v.weight": (inner, inner),
            f"{blk}.attn1.to_out.0.weight": (inner, inner),
            f"{blk}.attn1.to_out.0.bias": (inner,),
            f"{blk}.norm3.weight": (inner,), f"{blk}.norm3.bias": (inner,),
            f"{blk}.ff.net.0.proj.weight": (inner * 8, inner),
            f"{blk}.ff.net.0.proj.bias": (inner * 8,),
            f"{blk}.ff.net.2.weight": (inner, inner * 4),
            f"{blk}.ff.net.2.bias": (inner,),
        })
    return sd


def clip_vision_keys() -> Dict[str, Shape]:
    """CLIPVisionModelWithProjection (sd-image-variations image_encoder:
    ViT-L/14, projection 768) — real transformers module on the meta device."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, patch_size=14, image_size=224,
        projection_dim=768,
    )
    with torch.device("meta"):
        m = CLIPVisionModelWithProjection(cfg)
    return {k: tuple(v.shape) for k, v in m.state_dict().items()}


def wav2vec2_keys(prefix: str = "") -> Dict[str, Shape]:
    """facebook/wav2vec2-base-960h (transformers default config is base) —
    real module on the meta device.  NOTE: the published pytorch_model.bin
    stores the positional conv's weight norm as weight_g/weight_v; newer
    torch parametrizes it — the converter folds both spellings."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    with torch.device("meta"):
        m = Wav2Vec2Model(Wav2Vec2Config())
    return {f"{prefix}{k}": tuple(v.shape) for k, v in m.state_dict().items()}


def audio2mesh_keys(include_encoder: bool = True) -> Dict[str, Shape]:
    """audio2mesh.pt (reference src/audio_models/model.py:11-38):
    audio_encoder.* + in_fn (768->512) + out_fn (512->1404)."""
    sd: Dict[str, Shape] = {
        "in_fn.weight": (512, 768), "in_fn.bias": (512,),
        "out_fn.weight": (1404, 512), "out_fn.bias": (1404,),
    }
    if include_encoder:
        sd.update(wav2vec2_keys(prefix="audio_encoder."))
    return sd


def audio2pose_keys(include_encoder: bool = True) -> Dict[str, Shape]:
    """audio2pose.pt (reference src/audio_models/pose_model.py:57-96):
    audio_encoder.* + pose_map/in_fn/PPE buffer + 8-layer torch
    TransformerDecoder (d=512, ff=1024) + pose_map_r + 100-way id_embed."""
    d, ff, out_dim = 512, 1024, 6
    sd: Dict[str, Shape] = {
        "pose_map.weight": (d, out_dim), "pose_map.bias": (d,),
        "in_fn.weight": (d, 768), "in_fn.bias": (d,),
        "PPE.pe": (1, 600, d),
        "pose_map_r.weight": (out_dim, d), "pose_map_r.bias": (out_dim,),
        "id_embed.weight": (100, d),
    }
    for i in range(8):
        base = f"transformer_decoder.layers.{i}"
        for attn in ("self_attn", "multihead_attn"):
            sd[f"{base}.{attn}.in_proj_weight"] = (3 * d, d)
            sd[f"{base}.{attn}.in_proj_bias"] = (3 * d,)
            sd[f"{base}.{attn}.out_proj.weight"] = (d, d)
            sd[f"{base}.{attn}.out_proj.bias"] = (d,)
        sd[f"{base}.linear1.weight"] = (ff, d)
        sd[f"{base}.linear1.bias"] = (ff,)
        sd[f"{base}.linear2.weight"] = (d, ff)
        sd[f"{base}.linear2.bias"] = (d,)
        for n in (1, 2, 3):
            sd[f"{base}.norm{n}.weight"] = (d,)
            sd[f"{base}.norm{n}.bias"] = (d,)
    if include_encoder:
        sd.update(wav2vec2_keys(prefix="audio_encoder."))
    return sd
