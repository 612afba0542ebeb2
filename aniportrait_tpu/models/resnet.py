"""Pseudo-3D conv/resnet primitives, channels-last.

Parity targets: reference ``src/models/resnet.py`` (InflatedConv3d,
InflatedGroupNorm, Upsample3D, Downsample3D, ResnetBlock3D).  On TPU the
"inflation" (fold frames into batch, run 2D op, unfold) is a pair of reshapes
XLA folds away; tensors are ``(b, f, h, w, c)``.
"""

from __future__ import annotations

import math
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
    a single multiply-add.  The stats pass reduces over the TOKEN axes only
    (channel lanes preserved), then collapses the tiny (n, c) result to
    per-group scalars: reducing a (n, tokens, g, c//g) view over (tokens,
    c//g) straddles the 128-lane tile, and XLA relayouts the whole tensor to
    do it — the trace showed ~2 s/clip of pure copy/relayout around these
    stats before this two-stage formulation."""
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    token_axes = tuple(range(1, x.ndim - 1))
    count = math.prod(x.shape[1:-1]) * (c // g)
    # each reduction/normalise pass converts bf16->f32 INLINE (fused into
    # its own consumer) rather than sharing one materialised f32 copy of x:
    # a shared xf is 2x the HBM bytes on every read and showed up as pure
    # convert/copy time in the device trace.  NOTE (r4): the two sums are
    # NOT two reads — XLA multi-output-fuses them into ONE kLoop fusion
    # reading x once (verified in compiled HLO; a variadic lax.reduce
    # one-pass rewrite measured 1.46 vs 1.41 ms on chip, i.e. no win), so
    # the stats pass is already at its one-read bandwidth floor.
    s1 = jnp.sum(x, axis=token_axes, dtype=jnp.float32)  # (n, c) lane-aligned
    s2 = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=token_axes
    )
    xf = x.astype(jnp.float32)
    s1g = s1.reshape(n, g, c // g).sum(axis=-1)   # (n, g) — tiny
    s2g = s2.reshape(n, g, c // g).sum(axis=-1)
    mean = s1g / count                            # (n, g) f32
    var = jnp.maximum(s2g / count - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + epsilon)
    # fold (x - mean) * inv * scale + bias into x * a + b with per-channel
    # f32 coefficients; the normalisation is then ONE fused elementwise
    # pass over x (f32 arithmetic, bf16 in/out)
    mean_c = jnp.repeat(mean, c // g, axis=-1)    # (n, c)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None]   # (n, c) f32
    b = bias.astype(jnp.float32)[None] - mean_c * a
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    a, b = a.reshape(shape), b.reshape(shape)
    return (xf * a + b).astype(x.dtype)


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
