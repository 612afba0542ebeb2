"""AutoencoderKL (SD-1.5 / sd-vae-ft-mse) in flax, channels-last.

Parity target: the diffusers ``AutoencoderKL`` the reference loads at
``scripts/pose2vid.py:59-62`` (``sd-vae-ft-mse``): 4-level encoder
(128/256/512/512, 2 resnets per level), attention mid blocks, 4-level
decoder (3 resnets per level), ``quant_conv``/``post_quant_conv``,
latent scaling 0.18215 applied by the pipelines
(reference pipeline_pose2vid_long.py:424-431).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.models.resnet import group_norm


class VaeResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = GroupNorm2D(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm2D(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class GroupNorm2D(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)


class VaeAttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid-block attention)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        hid = GroupNorm2D(name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(hid)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(hid)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(hid)
        from aniportrait_tpu.ops.attention import scaled_dot_product_attention

        hid = scaled_dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        hid = nn.Dense(c, dtype=self.dtype, name="to_out_0")(hid)
        return residual + hid.reshape(b, h, w, c)


class VaeMidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VaeResnetBlock(self.channels, dtype=self.dtype, name="resnet_0")(x)
        x = VaeAttentionBlock(dtype=self.dtype, name="attn_0")(x)
        x = VaeResnetBlock(self.channels, dtype=self.dtype, name="resnet_1")(x)
        return x


class VaeEncoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = list(self.block_out_channels)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                x = VaeResnetBlock(c, dtype=self.dtype, name=f"down_{i}_resnet_{j}")(x)
            if i < len(ch) - 1:
                # diffusers Downsample2D pads (0,1,0,1) then stride-2 VALID conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    c,
                    (3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(x)
        x = VaeMidBlock(ch[-1], dtype=self.dtype, name="mid")(x)
        x = GroupNorm2D(name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(
            2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        return x


class VaeDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = VaeMidBlock(rev[0], dtype=self.dtype, name="mid")(x)
        for i, c in enumerate(rev):
            for j in range(self.layers_per_block):
                x = VaeResnetBlock(c, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(x)
            if i < len(rev) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(
                    c, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample"
                )(x)
        x = GroupNorm2D(name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        return x


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image.  Scaling (x0.18215) is
    the caller's job, matching diffusers semantics."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VaeEncoder(
            self.block_out_channels, latent_channels=self.latent_channels, dtype=self.dtype
        )
        self.decoder = VaeDecoder(self.block_out_channels, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, x):
        """x: (b, h, w, 3) in [-1, 1] -> (mean, logvar) each (b, h/8, w/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """z: (b, h/8, w/8, 4) -> (b, h, w, 3)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, logvar = self.encode(x)
        return self.decode(mean)
