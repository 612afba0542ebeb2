"""Numerical parity of flax models + weight converter vs torch references.

Uses tiny configs (compile cost on this host) and the torch packages that are
available (transformers CLIP/wav2vec2, plain torch for the pose decoder).
These validate the exact math paths the real checkpoints will flow through.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

ATOL = 2e-4


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection as TorchCLIP

    cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    tm = TorchCLIP(cfg).eval()
    sd = tm.state_dict()

    from aniportrait_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from aniportrait_tpu.weights.convert import convert_clip_vision

    params, unused = convert_clip_vision(sd)
    assert not [u for u in unused if "position_ids" not in u], unused

    jm = CLIPVisionModelWithProjection(
        hidden=32, layers=2, heads=4, intermediate=64, patch=8, image_size=32,
        projection_dim=16,
    )
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    with jax.default_matmul_precision("highest"):
        out = jax.jit(jm.apply)({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=1e-3)


def test_wav2vec2_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2Model as TorchW2V

    cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_feat_extract_layers=2,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        feat_extract_activation="gelu",
        conv_bias=False,
    )
    tm = TorchW2V(cfg).eval()
    sd = tm.state_dict()

    from aniportrait_tpu.audio.wav2vec2 import Wav2Vec2Model, linear_interpolation
    from aniportrait_tpu.weights.convert import convert_wav2vec2

    params, unused = convert_wav2vec2(sd)
    assert not unused, unused

    jm = Wav2Vec2Model(
        hidden=32, layers=2, heads=4, intermediate=64,
        pos_conv_kernel=16, pos_conv_groups=4,
        conv_layers=((16, 10, 5), (16, 3, 2)),
    )
    wav = np.random.RandomState(0).randn(1, 800).astype(np.float32)
    # torch reference: run encoder on raw features, then compare at matched
    # seq_len — reference resamples features before the encoder, so align by
    # choosing seq_len == natural feature length (interp becomes identity).
    with torch.no_grad():
        feats = tm.feature_extractor(torch.from_numpy(wav)).transpose(1, 2)
        t_nat = feats.shape[1]
        hidden, _ = tm.feature_projection(feats)
        ref = tm.encoder(hidden).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        out, _ = jax.jit(lambda p, w: jm.apply(p, w, t_nat))({"params": params}, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=1e-3)


def test_linear_interpolation_matches_torch():
    import torch.nn.functional as TF

    from aniportrait_tpu.audio.wav2vec2 import linear_interpolation

    x = np.random.RandomState(1).randn(2, 49, 8).astype(np.float32)
    for seq_len in (10, 30, 49, 75):
        ref = (
            TF.interpolate(
                torch.from_numpy(x).transpose(1, 2),
                size=seq_len,
                align_corners=True,
                mode="linear",
            )
            .transpose(1, 2)
            .numpy()
        )
        out = np.asarray(linear_interpolation(jnp.asarray(x), seq_len))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_audio2pose_decoder_parity():
    """Full AR loop parity vs a torch TransformerDecoder driven exactly like
    the reference (pose_model.py:97-124), incl. ALiBi mask + diagonal memory
    mask + KV-cache equivalence."""
    import math
    import torch.nn as tnn

    d, heads, layers, out_dim, T = 16, 4, 2, 6, 5
    rs = np.random.RandomState(0)

    dec_layer = tnn.TransformerDecoderLayer(
        d_model=d, nhead=heads, dim_feedforward=2 * d, batch_first=True
    )
    tdec = tnn.TransformerDecoder(dec_layer, num_layers=layers).eval()
    pose_map = tnn.Linear(out_dim, d)
    pose_map_r = tnn.Linear(d, out_dim)
    id_embed = tnn.Embedding(10, d)

    # --- reference-style biased mask (reimplementation of the formula)
    def slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    max_len = 20
    alibi = torch.zeros(max_len, max_len)
    bias = -torch.flip(torch.arange(max_len), dims=[0])
    for i in range(max_len):
        alibi[i, : i + 1] = bias[-(i + 1) :]
    alibi = torch.tensor(slopes(heads)).view(-1, 1, 1) * alibi.unsqueeze(0)
    causal = torch.triu(torch.ones(max_len, max_len)) == 1
    causal = causal.transpose(0, 1).float().masked_fill(~causal.transpose(0, 1), float("-inf")).masked_fill(causal.transpose(0, 1), 0.0)
    biased_mask = causal.unsqueeze(0) + alibi

    memory = torch.from_numpy(rs.randn(1, T, d).astype(np.float32))
    id_seed = torch.tensor([3])

    # interleaved sin/cos PE
    from aniportrait_tpu.models.embeddings import sinusoidal_positional_encoding

    pe = torch.from_numpy(sinusoidal_positional_encoding(600, d))

    with torch.no_grad():
        id_embedding = id_embed(id_seed).unsqueeze(1)
        init_pose = torch.zeros([1, 1, out_dim])
        for i in range(T):
            if i == 0:
                pose_emb = pose_map(init_pose)
            pose_input = pose_emb + pe[:, : pose_emb.shape[1]]
            pose_input = pose_input + id_embedding
            L = pose_input.shape[1]
            tgt_mask = biased_mask[:, :L, :L]
            memory_mask = ~torch.eye(L, T, dtype=torch.bool)
            pose_out = tdec(
                pose_input, memory, tgt_mask=tgt_mask, memory_mask=memory_mask
            )
            pose_out = pose_map_r(pose_out)
            new_output = pose_map(pose_out[:, -1, :]).unsqueeze(1)
            pose_emb = torch.cat((pose_emb, new_output), 1)
        ref = pose_out.numpy()

    # --- flax side: build params via converter from an equivalent state dict
    sd = {}
    for i in range(layers):
        for src, dst in tdec.layers[i].state_dict().items():
            sd[f"transformer_decoder.layers.{i}.{src}"] = dst
    sd["pose_map.weight"] = pose_map.weight
    sd["pose_map.bias"] = pose_map.bias
    sd["pose_map_r.weight"] = pose_map_r.weight
    sd["pose_map_r.bias"] = pose_map_r.bias
    sd["id_embed.weight"] = id_embed.weight

    from aniportrait_tpu.weights.convert import convert_audio2pose

    params, unused = convert_audio2pose(sd, num_layers=layers)
    assert not unused, unused

    # drive the decoder directly (skip the audio encoder)
    from aniportrait_tpu.audio.audio2pose import ARDecoderStep
    import flax.linen as nn

    scanned = nn.scan(
        ARDecoderStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )(out_dim=out_dim, d_model=d, num_layers=layers, heads=heads, max_len=T, name="decoder")

    id_j = jnp.asarray(id_embed.weight.detach().numpy()[3])[None]
    carry0 = (
        jnp.zeros((1, out_dim)),
        jnp.zeros((layers, 1, T, d)),
        jnp.zeros((layers, 1, T, d)),
        id_j,
    )
    xs = (
        jnp.arange(T, dtype=jnp.int32),
        jnp.asarray(memory.numpy()).transpose(1, 0, 2),
        jnp.asarray(pe.numpy()[0, :T]),
    )
    with jax.default_matmul_precision("highest"):
        _, outs = jax.jit(
            lambda p, c, xs: scanned.apply({"params": p["decoder"]}, c, xs)
        )(params, carry0, xs)
    out = np.asarray(outs).transpose(1, 0, 2)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
