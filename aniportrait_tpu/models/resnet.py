"""Pseudo-3D conv/resnet primitives, channels-last.

Parity targets: reference ``src/models/resnet.py`` (InflatedConv3d,
InflatedGroupNorm, Upsample3D, Downsample3D, ResnetBlock3D).  On TPU the
"inflation" (fold frames into batch, run 2D op, unfold) is a pair of reshapes
XLA folds away; tensors are ``(b, f, h, w, c)``.
"""

from __future__ import annotations

from typing import Optional

import jax.lax as lax
import jax.numpy as jnp
import flax.linen as nn


def fold_frames(x):
    """(b, f, h, w, c) -> (b*f, h, w, c)"""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


def unfold_frames(x, f: int):
    """(b*f, h, w, c) -> (b, f, h, w, c)"""
    bf, h, w, c = x.shape
    return x.reshape(bf // f, f, h, w, c)


class InflatedConv(nn.Module):
    """2D conv applied per-frame to (b, f, h, w, c) (reference resnet.py:10-18).

    Torch param name: ``conv`` (Conv2d OIHW -> flax HWIO via converter).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = x.shape[1]
        h = fold_frames(x)
        h = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            dtype=self.dtype,
            name="conv",
        )(h)
        return unfold_frames(h, f)


def group_norm(x, scale, bias, num_groups: int, epsilon: float = 1e-6):
    """GroupNorm over the trailing channel axis of an (N, ..., C) array,
    statistics over all non-batch axes.

    Statistics are computed in f32 (reduction accuracy); the normalisation
    itself runs in the INPUT dtype with the per-group f32 scalars folded to
    a single multiply-add — profiling showed the previous
    materialise-everything-in-f32 version was ~60 ms of a 640 ms full-size
    UNet forward (pure HBM traffic)."""
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)   # (n, 1, g, 1) f32
    var = xf.var(axis=(1, 3), keepdims=True)
    inv = lax.rsqrt(var + epsilon)
    # fold (x - mean) * inv * scale + bias into x * a + b with per-channel
    # f32 coefficients; the normalisation is then ONE fused elementwise
    # pass over x (f32 arithmetic, bf16 in/out)
    scale_g = scale.astype(jnp.float32).reshape(1, 1, g, c // g)
    bias_g = bias.astype(jnp.float32).reshape(1, 1, g, c // g)
    a = (inv * scale_g).reshape(n, 1, c)         # f32
    b = (bias_g - mean * inv * scale_g).reshape(n, 1, c)
    if x.ndim != 3:
        shape = (n,) + (1,) * (x.ndim - 2) + (c,)
        a, b = a.reshape(shape), b.reshape(shape)
    return (x.astype(jnp.float32) * a + b).astype(x.dtype)


class GroupNorm5D(nn.Module):
    """GroupNorm over (b, f, h, w, c).

    inflated=True  -> per-frame statistics (reference InflatedGroupNorm,
                      shipped inference_v2 config, resnet.py:21-29).
    inflated=False -> statistics pooled over the frame axis too (plain torch
                      GroupNorm on (b, c, f, h, w); legacy v1 configs).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    inflated: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.inflated:
            f = x.shape[1]
            return unfold_frames(
                group_norm(fold_frames(x), scale, bias, self.num_groups, self.epsilon),
                f,
            )
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)


class Upsample3D(nn.Module):
    """Nearest x2 spatial-only upsample + conv (reference resnet.py:32-91)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return InflatedConv(self.features, dtype=self.dtype, name="conv")(x)


class Downsample3D(nn.Module):
    """Stride-2 3x3 conv (reference resnet.py:94-121)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return InflatedConv(
            self.features, kernel_size=3, stride=2, padding=1, dtype=self.dtype, name="conv"
        )(x)


class ResnetBlock3D(nn.Module):
    """GN -> SiLU -> conv -> (+temb) -> GN -> SiLU -> conv -> (+shortcut)
    (reference resnet.py:124-248, ``time_embedding_norm='default'``)."""

    out_channels: int
    use_inflated_groupnorm: bool = True
    groups: int = 32
    eps: float = 1e-5  # unet_3d.py passes resnet_eps=norm_eps=1e-5; VAE uses 1e-6
    time_embedding_norm: str = "default"
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_channels = x.shape[-1]
        h = GroupNorm5D(
            self.groups, self.eps, inflated=self.use_inflated_groupnorm, name="norm1"
        )(x)
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            proj_out = (
                self.out_channels
                if self.time_embedding_norm == "default"
                else self.out_channels * 2
            )
            t = nn.Dense(proj_out, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            t = t[:, None, None, None, :]  # (b, 1, 1, 1, C)
            if self.time_embedding_norm == "default":
                h = h + t

        h = GroupNorm5D(
            self.groups, self.eps, inflated=self.use_inflated_groupnorm, name="norm2"
        )(h)
        if temb is not None and self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(t, 2, axis=-1)
            h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            x = InflatedConv(
                self.out_channels,
                kernel_size=1,
                padding=0,
                dtype=self.dtype,
                name="conv_shortcut",
            )(x)

        return (x + h) / self.output_scale_factor
