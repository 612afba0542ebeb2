"""Structural consistency: every flax path the weight converter produces for
diffusers-style UNet keys must exist in the AniUNet parameter tree (catches
rename-rule typos without needing diffusers)."""

import numpy as np
import jax
import jax.numpy as jnp

from aniportrait_tpu.models.unet import AniUNet
from aniportrait_tpu.weights.convert import convert_unet

TINY = dict(block_out_channels=(32, 64, 64, 64), attention_heads=8, cross_attention_dim=16)


def synth_unet_state_dict():
    """Representative diffusers 3D-UNet keys (one of each module kind),
    with rank-correct dummy tensors."""
    lin = np.zeros((8, 8), np.float32)
    vec = np.zeros((8,), np.float32)
    conv = np.zeros((8, 8, 3, 3), np.float32)
    conv1x1 = np.zeros((8, 8, 1, 1), np.float32)
    sd = {
        "conv_in.weight": conv, "conv_in.bias": vec,
        "time_embedding.linear_1.weight": lin, "time_embedding.linear_1.bias": vec,
        "time_embedding.linear_2.weight": lin, "time_embedding.linear_2.bias": vec,
        "conv_norm_out.weight": vec, "conv_norm_out.bias": vec,
        "conv_out.weight": conv, "conv_out.bias": vec,
    }
    for prefix, fl in [("down_blocks.0.resnets.0", None), ("mid_block.resnets.1", None),
                       ("up_blocks.1.resnets.2", None)]:
        sd.update({
            f"{prefix}.norm1.weight": vec, f"{prefix}.norm1.bias": vec,
            f"{prefix}.conv1.weight": conv, f"{prefix}.conv1.bias": vec,
            f"{prefix}.time_emb_proj.weight": lin, f"{prefix}.time_emb_proj.bias": vec,
            f"{prefix}.norm2.weight": vec, f"{prefix}.norm2.bias": vec,
            f"{prefix}.conv2.weight": conv, f"{prefix}.conv2.bias": vec,
        })
    sd["up_blocks.1.resnets.2.conv_shortcut.weight"] = conv1x1
    sd["up_blocks.1.resnets.2.conv_shortcut.bias"] = vec
    sd["down_blocks.0.downsamplers.0.conv.weight"] = conv
    sd["down_blocks.0.downsamplers.0.conv.bias"] = vec
    sd["up_blocks.1.upsamplers.0.conv.weight"] = conv
    sd["up_blocks.1.upsamplers.0.conv.bias"] = vec
    for prefix in ["down_blocks.1.attentions.0", "mid_block.attentions.0",
                   "up_blocks.2.attentions.1"]:
        sd.update({
            f"{prefix}.norm.weight": vec, f"{prefix}.norm.bias": vec,
            f"{prefix}.proj_in.weight": conv1x1, f"{prefix}.proj_in.bias": vec,
            f"{prefix}.proj_out.weight": conv1x1, f"{prefix}.proj_out.bias": vec,
        })
        for blk in [f"{prefix}.transformer_blocks.0"]:
            sd.update({
                f"{blk}.norm1.weight": vec, f"{blk}.norm1.bias": vec,
                f"{blk}.norm2.weight": vec, f"{blk}.norm2.bias": vec,
                f"{blk}.norm3.weight": vec, f"{blk}.norm3.bias": vec,
                f"{blk}.attn1.to_q.weight": lin, f"{blk}.attn1.to_k.weight": lin,
                f"{blk}.attn1.to_v.weight": lin,
                f"{blk}.attn1.to_out.0.weight": lin, f"{blk}.attn1.to_out.0.bias": vec,
                f"{blk}.attn2.to_q.weight": lin, f"{blk}.attn2.to_k.weight": lin,
                f"{blk}.attn2.to_v.weight": lin,
                f"{blk}.attn2.to_out.0.weight": lin, f"{blk}.attn2.to_out.0.bias": vec,
                f"{blk}.ff.net.0.proj.weight": lin, f"{blk}.ff.net.0.proj.bias": vec,
                f"{blk}.ff.net.2.weight": lin, f"{blk}.ff.net.2.bias": vec,
            })
    mm = "down_blocks.2.motion_modules.1.temporal_transformer"
    sd.update({
        f"{mm}.norm.weight": vec, f"{mm}.norm.bias": vec,
        f"{mm}.proj_in.weight": lin, f"{mm}.proj_in.bias": vec,
        f"{mm}.proj_out.weight": lin, f"{mm}.proj_out.bias": vec,
    })
    for k in range(2):
        blk = f"{mm}.transformer_blocks.0"
        sd.update({
            f"{blk}.attention_blocks.{k}.to_q.weight": lin,
            f"{blk}.attention_blocks.{k}.to_k.weight": lin,
            f"{blk}.attention_blocks.{k}.to_v.weight": lin,
            f"{blk}.attention_blocks.{k}.to_out.0.weight": lin,
            f"{blk}.attention_blocks.{k}.to_out.0.bias": vec,
            f"{blk}.attention_blocks.{k}.pos_encoder.pe": np.zeros((1, 32, 8), np.float32),
            f"{blk}.norms.{k}.weight": vec, f"{blk}.norms.{k}.bias": vec,
        })
    sd.update({
        f"{mm}.transformer_blocks.0.ff.net.0.proj.weight": lin,
        f"{mm}.transformer_blocks.0.ff.net.0.proj.bias": vec,
        f"{mm}.transformer_blocks.0.ff.net.2.weight": lin,
        f"{mm}.transformer_blocks.0.ff.net.2.bias": vec,
        f"{mm}.transformer_blocks.0.ff_norm.weight": vec,
        f"{mm}.transformer_blocks.0.ff_norm.bias": vec,
    })
    return sd


def paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= paths(v, p)
        else:
            out.add(p)
    return out


def test_unet_converter_paths_exist_in_model():
    sd = synth_unet_state_dict()
    converted, unused = convert_unet(sd, has_output_head=True)
    assert not unused, f"unconverted keys: {unused}"

    net = AniUNet(**TINY, use_motion_module=True)
    x = jnp.zeros((1, 2, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 16))
    params = jax.jit(lambda k: net.init(k, x, t, ctx))(jax.random.PRNGKey(0))["params"]

    model_paths = paths(params)
    converted_paths = paths(converted)
    missing = sorted(converted_paths - model_paths)
    assert not missing, f"converter writes paths absent from the model: {missing[:10]}"


def test_vae_converter_paths_exist_in_model():
    from aniportrait_tpu.models.vae import AutoencoderKL
    from aniportrait_tpu.weights.convert import convert_vae

    lin = np.zeros((8, 8), np.float32)
    vec = np.zeros((8,), np.float32)
    conv = np.zeros((8, 8, 3, 3), np.float32)
    sd = {}
    for side in ("encoder", "decoder"):
        sd.update({
            f"{side}.conv_in.weight": conv, f"{side}.conv_in.bias": vec,
            f"{side}.conv_norm_out.weight": vec, f"{side}.conv_norm_out.bias": vec,
            f"{side}.conv_out.weight": conv, f"{side}.conv_out.bias": vec,
        })
        for j in range(2):
            pre = f"{side}.mid_block.resnets.{j}"
            sd.update({
                f"{pre}.norm1.weight": vec, f"{pre}.norm1.bias": vec,
                f"{pre}.conv1.weight": conv, f"{pre}.conv1.bias": vec,
                f"{pre}.norm2.weight": vec, f"{pre}.norm2.bias": vec,
                f"{pre}.conv2.weight": conv, f"{pre}.conv2.bias": vec,
            })
        a = f"{side}.mid_block.attentions.0"
        sd.update({
            f"{a}.group_norm.weight": vec, f"{a}.group_norm.bias": vec,
            f"{a}.to_q.weight": lin, f"{a}.to_q.bias": vec,
            f"{a}.to_k.weight": lin, f"{a}.to_k.bias": vec,
            f"{a}.to_v.weight": lin, f"{a}.to_v.bias": vec,
            f"{a}.to_out.0.weight": lin, f"{a}.to_out.0.bias": vec,
        })
    sd.update({
        "encoder.down_blocks.1.resnets.0.norm1.weight": vec,
        "encoder.down_blocks.1.resnets.0.norm1.bias": vec,
        "encoder.down_blocks.1.resnets.0.conv1.weight": conv,
        "encoder.down_blocks.1.resnets.0.conv1.bias": vec,
        "encoder.down_blocks.1.resnets.0.norm2.weight": vec,
        "encoder.down_blocks.1.resnets.0.norm2.bias": vec,
        "encoder.down_blocks.1.resnets.0.conv2.weight": conv,
        "encoder.down_blocks.1.resnets.0.conv2.bias": vec,
        "encoder.down_blocks.0.downsamplers.0.conv.weight": conv,
        "encoder.down_blocks.0.downsamplers.0.conv.bias": vec,
        "decoder.up_blocks.2.resnets.2.norm1.weight": vec,
        "decoder.up_blocks.2.resnets.2.norm1.bias": vec,
        "decoder.up_blocks.2.resnets.2.conv1.weight": conv,
        "decoder.up_blocks.2.resnets.2.conv1.bias": vec,
        "decoder.up_blocks.2.resnets.2.norm2.weight": vec,
        "decoder.up_blocks.2.resnets.2.norm2.bias": vec,
        "decoder.up_blocks.2.resnets.2.conv2.weight": conv,
        "decoder.up_blocks.2.resnets.2.conv2.bias": vec,
        # channel-changing first resnet of a decoder up block has a shortcut
        "decoder.up_blocks.2.resnets.0.norm1.weight": vec,
        "decoder.up_blocks.2.resnets.0.norm1.bias": vec,
        "decoder.up_blocks.2.resnets.0.conv1.weight": conv,
        "decoder.up_blocks.2.resnets.0.conv1.bias": vec,
        "decoder.up_blocks.2.resnets.0.norm2.weight": vec,
        "decoder.up_blocks.2.resnets.0.norm2.bias": vec,
        "decoder.up_blocks.2.resnets.0.conv2.weight": conv,
        "decoder.up_blocks.2.resnets.0.conv2.bias": vec,
        "decoder.up_blocks.2.resnets.0.conv_shortcut.weight": np.zeros((8, 8, 1, 1), np.float32),
        "decoder.up_blocks.2.resnets.0.conv_shortcut.bias": vec,
        "decoder.up_blocks.1.upsamplers.0.conv.weight": conv,
        "decoder.up_blocks.1.upsamplers.0.conv.bias": vec,
        "quant_conv.weight": np.zeros((8, 8, 1, 1), np.float32),
        "quant_conv.bias": vec,
        "post_quant_conv.weight": np.zeros((4, 4, 1, 1), np.float32),
        "post_quant_conv.bias": np.zeros((4,), np.float32),
    })
    converted, unused = convert_vae(sd)
    assert not unused, unused

    vae = AutoencoderKL(block_out_channels=(32, 32, 64, 64))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    missing = sorted(paths(converted) - paths(params))
    assert not missing, missing[:10]


def test_pose_guider_converter_paths_exist_in_model():
    from aniportrait_tpu.models.pose_guider import PoseGuider
    from aniportrait_tpu.weights.convert import convert_pose_guider

    lin = np.zeros((8, 8), np.float32)
    vec = np.zeros((8,), np.float32)
    conv = np.zeros((8, 8, 3, 3), np.float32)
    conv1 = np.zeros((8, 8, 1, 1), np.float32)
    sd = {"final_proj.weight": conv1, "final_proj.bias": vec,
          "scale": np.ones((1,), np.float32)}
    for idx in (0, 3, 6, 9, 12, 15, 18, 21):
        sd[f"conv_layers.{idx}.weight"] = conv
        sd[f"conv_layers.{idx}.bias"] = vec
        sd[f"conv_layers.{idx+1}.weight"] = vec
        sd[f"conv_layers.{idx+1}.bias"] = vec
        sd[f"conv_layers.{idx+1}.running_mean"] = vec
        sd[f"conv_layers.{idx+1}.running_var"] = vec
        sd[f"conv_layers.{idx+1}.num_batches_tracked"] = np.zeros((), np.float32)
    for n, n_convs in [(1, 2), (2, 2), (3, 2), (4, 1)]:
        for j in range(n_convs):
            sd[f"conv_layers_{n}.{3*j}.weight"] = conv
            sd[f"conv_layers_{n}.{3*j}.bias"] = vec
            sd[f"conv_layers_{n}.{3*j+1}.weight"] = vec
            sd[f"conv_layers_{n}.{3*j+1}.bias"] = vec
            sd[f"conv_layers_{n}.{3*j+1}.running_mean"] = vec
            sd[f"conv_layers_{n}.{3*j+1}.running_var"] = vec
        ca = f"cross_attn{n}"
        sd.update({
            f"{ca}.norm.weight": vec, f"{ca}.norm.bias": vec,
            f"{ca}.proj_in.weight": conv1, f"{ca}.proj_in.bias": vec,
            f"{ca}.proj_out.weight": conv1, f"{ca}.proj_out.bias": vec,
            f"{ca}.transformer_blocks.0.norm1.weight": vec,
            f"{ca}.transformer_blocks.0.norm1.bias": vec,
            f"{ca}.transformer_blocks.0.norm3.weight": vec,
            f"{ca}.transformer_blocks.0.norm3.bias": vec,
            f"{ca}.transformer_blocks.0.attn1.to_q.weight": lin,
            f"{ca}.transformer_blocks.0.attn1.to_k.weight": lin,
            f"{ca}.transformer_blocks.0.attn1.to_v.weight": lin,
            f"{ca}.transformer_blocks.0.attn1.to_out.0.weight": lin,
            f"{ca}.transformer_blocks.0.attn1.to_out.0.bias": vec,
            f"{ca}.transformer_blocks.0.ff.net.0.proj.weight": lin,
            f"{ca}.transformer_blocks.0.ff.net.0.proj.bias": vec,
            f"{ca}.transformer_blocks.0.ff.net.2.weight": lin,
            f"{ca}.transformer_blocks.0.ff.net.2.bias": vec,
        })
    variables, unused = convert_pose_guider(sd)
    assert not unused, unused

    pg = PoseGuider(noise_latent_channels=32)
    init_vars = jax.jit(pg.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3)))
    missing_p = sorted(paths(variables["params"]) - paths(init_vars["params"]))
    missing_s = sorted(paths(variables["batch_stats"]) - paths(init_vars["batch_stats"]))
    assert not missing_p, missing_p[:10]
    assert not missing_s, missing_s[:10]
