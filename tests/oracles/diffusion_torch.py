"""Torch oracles for the diffusion core (test-only).

Minimal re-implementations of the reference's module MATH with the
reference's state_dict naming, so the repo's converter rules
(weights/convert.py) are exercised on the exact key layout the real
checkpoints use.  Sources of truth (reference file:line):

  * ResnetBlock3D         src/models/resnet.py:124-248
  * TemporalBasicTransformerBlock + bank concat + uc-mask
                          src/models/attention.py:300-445,
                          src/models/mutual_self_attention.py:93-265
  * Motion module         src/models/motion_module.py:130-388
  * PoseGuider            src/models/pose_guider.py:19-162
  * DDIM step             diffusers DDIMScheduler (v-prediction, zero-SNR
                          rescale, trailing spacing) as configured by
                          configs/inference/inference_v2.yaml:24-32

All tensors NCFHW / NCHW (torch layout), float32, no dropout.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------- primitives
class Attention(nn.Module):
    """diffusers Attention + default AttnProcessor math."""

    def __init__(self, query_dim, heads, dim_head, cross_attention_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        kv_dim = cross_attention_dim or query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(kv_dim, inner, bias=False)
        self.to_v = nn.Linear(kv_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, encoder_hidden_states=None):
        ctx = x if encoder_hidden_states is None else encoder_hidden_states
        b, sq, _ = x.shape
        q = self.to_q(x)
        k = self.to_k(ctx)
        v = self.to_v(ctx)

        def split(t):
            return t.reshape(b, -1, self.heads, t.shape[-1] // self.heads).permute(
                0, 2, 1, 3
            )

        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, sq, -1)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Dropout(0.0),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


def _fold(x):  # (b, c, f, h, w) -> (b*f, c, h, w)
    b, c, f, h, w = x.shape
    return x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)


def _unfold(x, f):  # (b*f, c, h, w) -> (b, c, f, h, w)
    bf, c, h, w = x.shape
    return x.reshape(bf // f, f, c, h, w).permute(0, 2, 1, 3, 4)


class InflatedConv3d(nn.Conv2d):
    def forward(self, x):
        f = x.shape[2]
        return _unfold(super().forward(_fold(x)), f)


class InflatedGroupNorm(nn.GroupNorm):
    """Reference InflatedGroupNorm folds frames into the batch: PER-FRAME
    statistics (resnet.py:21-29)."""

    def forward(self, x):
        f = x.shape[2]
        return _unfold(super().forward(_fold(x)), f)


# ------------------------------------------------------------ ResnetBlock3D
class ResnetBlock3D(nn.Module):
    """reference resnet.py:124-248 (default time_embedding_norm)."""

    def __init__(self, in_channels, out_channels, temb_channels=512,
                 groups=32, eps=1e-5, use_inflated_groupnorm=True,
                 time_embedding_norm="default"):
        super().__init__()
        self.time_embedding_norm = time_embedding_norm
        GN = InflatedGroupNorm if use_inflated_groupnorm else nn.GroupNorm
        if not use_inflated_groupnorm:
            raise NotImplementedError("oracle covers inflated GN (shipped cfg)")
        self.norm1 = GN(groups, in_channels, eps=eps, affine=True)
        self.conv1 = InflatedConv3d(in_channels, out_channels, 3, padding=1)
        out_mult = 2 if time_embedding_norm == "scale_shift" else 1
        self.time_emb_proj = nn.Linear(temb_channels, out_channels * out_mult)
        self.norm2 = GN(groups, out_channels, eps=eps, affine=True)
        self.conv2 = InflatedConv3d(out_channels, out_channels, 3, padding=1)
        self.conv_shortcut = (
            InflatedConv3d(in_channels, out_channels, 1)
            if in_channels != out_channels else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        temb = self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        if self.time_embedding_norm == "default":
            h = h + temb
            h = self.norm2(h)
        else:  # scale_shift
            h = self.norm2(h)
            scale, shift = torch.chunk(temb, 2, dim=1)
            h = h * (1 + scale) + shift
        h = self.conv2(F.silu(h))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


# ---------------------------------------- spatial block w/ reference banks
class TemporalBasicTransformerBlock(nn.Module):
    """reference attention.py:300-445 with the monkey-patched read/write
    forward of mutual_self_attention.py:93-265 (MODE and bank made explicit;
    unet_use_temporal_attention=False as in the shipped config)."""

    def __init__(self, dim, heads, dim_head, cross_attention_dim=768):
        super().__init__()
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm1 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head,
                               cross_attention_dim=cross_attention_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, hidden_states, encoder_hidden_states=None, mode="write",
                bank=None, video_length=1, do_classifier_free_guidance=False):
        """Returns (hidden_states, captured_bank_or_None).

        mode='read': bank is a list of (b, l, c) writer features; under CFG
        the FIRST half of the batch rows re-attends self-only
        (mutual_self_attention.py:166-186: uc_mask marks rows [1]*b//2+[0]*b//2).
        """
        norm_h = self.norm1(hidden_states)
        captured = None
        if mode == "write":
            captured = norm_h.clone()
            hidden_states = self.attn1(norm_h) + hidden_states
        else:
            bank_fea = [
                d.unsqueeze(1).repeat(1, video_length, 1, 1).reshape(
                    -1, d.shape[1], d.shape[2]
                )
                for d in bank
            ]
            kv = torch.cat([norm_h] + bank_fea, dim=1)
            hidden_states_uc = self.attn1(norm_h, encoder_hidden_states=kv) \
                + hidden_states
            if do_classifier_free_guidance:
                n = hidden_states.shape[0]
                uc_mask = torch.tensor([1] * (n // 2) + [0] * (n // 2)).bool()
                hidden_states_c = hidden_states_uc.clone()
                hidden_states_c[uc_mask] = self.attn1(
                    norm_h[uc_mask], encoder_hidden_states=norm_h[uc_mask]
                ) + hidden_states[uc_mask]
                hidden_states = hidden_states_c
            else:
                hidden_states = hidden_states_uc

        norm_h = self.norm2(hidden_states)
        hidden_states = self.attn2(
            norm_h, encoder_hidden_states=encoder_hidden_states
        ) + hidden_states
        hidden_states = self.ff(self.norm3(hidden_states)) + hidden_states
        return hidden_states, captured


class Transformer3DModel(nn.Module):
    """reference transformer_3d.py:27-169 (use_linear_projection=False ->
    1x1 conv proj): fold frames, GroupNorm, proj_in, blocks, proj_out,
    residual. Forward runs one mode for all blocks."""

    def __init__(self, in_channels, heads, cross_attention_dim=768,
                 n_blocks=1, norm_groups=32):
        super().__init__()
        dim_head = in_channels // heads
        self.norm = nn.GroupNorm(norm_groups, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Conv2d(in_channels, in_channels, 1)
        self.transformer_blocks = nn.ModuleList([
            TemporalBasicTransformerBlock(in_channels, heads, dim_head,
                                          cross_attention_dim)
            for _ in range(n_blocks)
        ])
        self.proj_out = nn.Conv2d(in_channels, in_channels, 1)

    def forward(self, x, encoder_hidden_states=None, mode="write", banks=None,
                do_classifier_free_guidance=False):
        """x: (b, c, f, h, w). banks: list per block of (b, l, c).
        Returns (out, captured list)."""
        f = x.shape[2]
        h2 = _fold(x)
        bf, c, hh, ww = h2.shape
        residual = h2
        h2 = self.norm(h2)
        h2 = self.proj_in(h2)
        h2 = h2.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        if encoder_hidden_states is not None and encoder_hidden_states.shape[0] != bf:
            encoder_hidden_states = encoder_hidden_states.repeat_interleave(f, dim=0)
        captured = []
        for i, block in enumerate(self.transformer_blocks):
            h2, cap = block(
                h2, encoder_hidden_states=encoder_hidden_states, mode=mode,
                bank=None if banks is None else [banks[i]], video_length=f,
                do_classifier_free_guidance=do_classifier_free_guidance,
            )
            if cap is not None:
                captured.append(cap)
        h2 = h2.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        h2 = self.proj_out(h2)
        return _unfold(h2 + residual, f), captured


class PoseGuiderTransformer2D(nn.Module):
    """reference pose_guider.py:181-308 Transformer2DModel: GroupNorm ->
    1x1 conv proj_in (C -> heads*dim_head) -> BasicTransformerBlock with
    cross_attention_dim=None (attn2 is None; encoder input ignored) ->
    1x1 conv proj_out -> residual."""

    def __init__(self, in_channels, heads=16, dim_head=88):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Conv2d(in_channels, inner, 1)
        block = nn.Module()
        block.norm1 = nn.LayerNorm(inner)
        block.attn1 = Attention(inner, heads, dim_head)
        block.norm3 = nn.LayerNorm(inner)
        block.ff = FeedForward(inner)
        self.transformer_blocks = nn.ModuleList([block])
        self.proj_out = nn.Conv2d(inner, in_channels, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        hid = self.norm(x)
        hid = self.proj_in(hid)
        inner = hid.shape[1]
        hid = hid.permute(0, 2, 3, 1).reshape(b, h * w, inner)
        blk = self.transformer_blocks[0]
        hid = blk.attn1(blk.norm1(hid)) + hid
        hid = blk.ff(blk.norm3(hid)) + hid
        hid = hid.reshape(b, h, w, inner).permute(0, 3, 1, 2)
        hid = self.proj_out(hid)
        return residual + hid


# ------------------------------------------------------------ motion module
class PositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len=32):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model)
        )
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class VersatileAttention(Attention):
    """Temporal mode only (motion_module.py:280-388)."""

    def __init__(self, query_dim, heads, dim_head, pe_max_len=32):
        super().__init__(query_dim, heads, dim_head)
        self.pos_encoder = PositionalEncoding(query_dim, max_len=pe_max_len)

    def forward(self, x, video_length=None):
        # (b*f, d, c) -> (b*d, f, c)
        bf, d, c = x.shape
        b = bf // video_length
        x = x.reshape(b, video_length, d, c).permute(0, 2, 1, 3).reshape(
            b * d, video_length, c
        )
        x = self.pos_encoder(x)
        x = super().forward(x)
        x = x.reshape(b, d, video_length, c).permute(0, 2, 1, 3).reshape(bf, d, c)
        return x


class TemporalTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, pe_max_len=32, n_attn=2):
        super().__init__()
        self.attention_blocks = nn.ModuleList([
            VersatileAttention(dim, heads, dim_head, pe_max_len)
            for _ in range(n_attn)
        ])
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(n_attn)])
        self.ff = FeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length=video_length) + x
        return self.ff(self.ff_norm(x)) + x


class TemporalTransformer3DModel(nn.Module):
    def __init__(self, in_channels, heads=8, n_blocks=1, pe_max_len=32,
                 norm_groups=32):
        super().__init__()
        inner = in_channels
        dim_head = in_channels // heads
        self.norm = nn.GroupNorm(norm_groups, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList([
            TemporalTransformerBlock(inner, heads, dim_head, pe_max_len)
            for _ in range(n_blocks)
        ])
        self.proj_out = nn.Linear(inner, in_channels)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x):
        # x: (b, c, f, h, w)
        f = x.shape[2]
        h2 = _fold(x)
        bf, c, hh, ww = h2.shape
        residual = h2
        h2 = self.norm(h2)
        h2 = h2.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h2 = self.proj_in(h2)
        for block in self.transformer_blocks:
            h2 = block(h2, video_length=f)
        h2 = self.proj_out(h2)
        h2 = h2.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        return _unfold(h2 + residual, f)


class VanillaTemporalModule(nn.Module):
    """Wrapper matching the checkpoint prefix 'temporal_transformer'."""

    def __init__(self, in_channels, heads=8, pe_max_len=32, norm_groups=32):
        super().__init__()
        self.temporal_transformer = TemporalTransformer3DModel(
            in_channels, heads=heads, pe_max_len=pe_max_len,
            norm_groups=norm_groups,
        )

    def forward(self, x):
        return self.temporal_transformer(x)


# -------------------------------------------------------------- pose guider
class PoseGuider(nn.Module):
    """Stem + pyramid + final_proj + scale (pose_guider.py:19-122); the
    per-scale Transformer2DModel self-attention is covered separately
    (its BasicTransformerBlock ignores the ref-pose input — attn2 is None)."""

    def __init__(self, noise_latent_channels=32):
        super().__init__()
        nc = noise_latent_channels

        def cbr(cin, cout, k, s):
            return [nn.Conv2d(cin, cout, k, stride=s, padding=1),
                    nn.BatchNorm2d(cout), nn.ReLU()]

        self.conv_layers = nn.Sequential(
            *cbr(3, 3, 3, 1), *cbr(3, 16, 4, 2),
            *cbr(16, 16, 3, 1), *cbr(16, 32, 4, 2),
            *cbr(32, 32, 3, 1), *cbr(32, 64, 4, 2),
            *cbr(64, 64, 3, 1), *cbr(64, 128, 3, 1),
        )
        self.final_proj = nn.Conv2d(128, nc, 1)
        self.conv_layers_1 = nn.Sequential(*cbr(nc, nc, 3, 1), *cbr(nc, nc, 3, 2))
        self.conv_layers_2 = nn.Sequential(*cbr(nc, nc, 3, 1), *cbr(nc, nc * 2, 3, 2))
        self.conv_layers_3 = nn.Sequential(
            *cbr(nc * 2, nc * 2, 3, 1), *cbr(nc * 2, nc * 4, 3, 2))
        self.conv_layers_4 = nn.Sequential(*cbr(nc * 4, nc * 4, 3, 1))
        self.scale = nn.Parameter(torch.ones(1) * 2)

    def forward(self, x):
        """x: (b, 3, H, W) -> list of 5 feature maps (matching fea[0..4])."""
        x = self.conv_layers(x)
        x = self.final_proj(x) * self.scale
        fea = [x]
        for layers in (self.conv_layers_1, self.conv_layers_2,
                       self.conv_layers_3, self.conv_layers_4):
            x = layers(x)
            fea.append(x)
        return fea


# --------------------------------------------------------------- DDIM step
def ddim_alphas(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
                beta_schedule="linear", rescale_betas_zero_snr=True):
    """diffusers betas + zero-SNR rescale (rescale_zero_terminal_snr)."""
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    else:
        raise ValueError(beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)
    if rescale_betas_zero_snr:
        ab_sqrt = np.sqrt(alphas_cumprod)
        ab0, abT = ab_sqrt[0], ab_sqrt[-1]
        ab_sqrt = ab_sqrt - abT
        ab_sqrt *= ab0 / (ab0 - abT)
        alphas_cumprod = ab_sqrt ** 2
    return alphas_cumprod


def ddim_step(model_output, timestep, prev_timestep, sample, alphas_cumprod,
              prediction_type="v_prediction", eta=0.0):
    """One deterministic DDIM step (diffusers DDIMScheduler.step, eta=0)."""
    a_t = alphas_cumprod[timestep]
    a_prev = alphas_cumprod[prev_timestep] if prev_timestep >= 0 else 1.0
    b_t = 1.0 - a_t
    if prediction_type == "epsilon":
        x0 = (sample - np.sqrt(b_t) * model_output) / np.sqrt(a_t)
        eps = model_output
    elif prediction_type == "v_prediction":
        x0 = np.sqrt(a_t) * sample - np.sqrt(b_t) * model_output
        eps = np.sqrt(a_t) * model_output + np.sqrt(b_t) * sample
    else:
        raise ValueError(prediction_type)
    return np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps
