"""Multi-scale pose-conditioning encoder (flax, channels-last).

Parity target: reference ``src/models/pose_guider.py``.  Stem of
BatchNorm+ReLU convs (3->16->32->64->128, three stride-2 steps), zero-init
1x1 projection to 320 channels, learnable scalar ``scale`` (init 2.0), then a
pyramid ``conv_layers_1..4`` producing (320@/16, 640@/32, 1280@/64,
1280@/64), each followed by a 1-layer self-attention transformer
(``use_ca=True``).

Behavioural note (verified against the reference): the per-scale
``Transformer2DModel`` is built with ``cross_attention_dim=None`` so its
``attn2`` is None, and its ``BasicTransformerBlock`` ignores the
``encoder_hidden_states`` (the reference-pose features) entirely
(reference attention.py:111-146, 228-235).  The ref-pose conv path is
dead compute with shared weights; we therefore run plain self-attention and
skip the ref path, producing identical outputs.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.models.attention import SpatialTransformerBlock
from aniportrait_tpu.models.resnet import fold_frames, group_norm, unfold_frames


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Conv2d(k=4, s=2, p=1) halves exactly; flax 'SAME' on even
        # kernels differs, so pad explicitly.
        pad = 1
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            # He-normal init, zero bias (reference pose_guider.py:108-117)
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class PoseGuiderTransformer(nn.Module):
    """GroupNorm -> 1x1 proj_in (C->1408) -> self-attn block -> 1x1 proj_out
    -> residual (reference pose_guider.py:181-308; heads=16, head_dim=88)."""

    channels: int
    heads: int = 16
    dim_head: int = 88
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        scale = self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32)
        hid = group_norm(x, scale, bias, 32, 1e-6)
        inner = self.heads * self.dim_head
        hid = hid.reshape(b, h * w, c)
        hid = nn.Dense(inner, use_bias=True, dtype=self.dtype, name="proj_in")(hid)
        hid, _ = SpatialTransformerBlock(
            dim=inner,
            heads=self.heads,
            dim_head=self.dim_head,
            cross_attention_dim=None,
            dtype=self.dtype,
            name="block_0",
        )(hid)
        hid = nn.Dense(c, use_bias=True, dtype=self.dtype, name="proj_out")(hid)
        return residual + hid.reshape(b, h, w, c)


class PoseGuider(nn.Module):
    noise_latent_channels: int = 320
    use_ca: bool = True
    # reference pose_guider.py:181-308 fixes the per-scale transformer at
    # heads=16, head_dim=88 (inner 1408) independent of the pyramid width;
    # configurable so test-scale models stay small
    attn_heads: int = 16
    attn_dim_head: int = 88
    # pyramid stages (reference: 4 -> features at /16,/32,/64,/64 with
    # channels nc,2nc,4nc,4nc); smaller UNets (fewer down blocks) take a
    # truncated pyramid — stage count must equal the UNet's down-block count
    num_stages: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose: jnp.ndarray, ref_pose: jnp.ndarray | None = None, train: bool = False):
        """
        Args:
          pose: (b, f, H, W, 3) target pose images.
          ref_pose: unused (dead path in the reference; kept for API parity).
        Returns: list of 5 tensors (b, f, H/2^k, W/2^k, c_k),
          c = (320, 320, 640, 1280, 1280), k = (3, 4, 5, 6, 6).
        """
        nc = self.noise_latent_channels
        b, f = pose.shape[0], pose.shape[1]
        x = fold_frames(pose)

        # stem (reference pose_guider.py:19-47): channels/strides
        stem = [
            (3, 3, 1), (16, 4, 2),
            (16, 3, 1), (32, 4, 2),
            (32, 3, 1), (64, 4, 2),
            (64, 3, 1), (128, 3, 1),
        ]
        for i, (c_out, k, s) in enumerate(stem):
            x = ConvBNRelu(c_out, k, s, dtype=self.dtype, name=f"stem_{i}")(x, train)

        x = nn.Conv(
            nc,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_proj",
        )(x)
        scale = self.param(
            "scale", lambda rng, shape: 2.0 * jnp.ones(shape, jnp.float32), (1,)
        )
        x = x * scale.astype(x.dtype)

        fea: List[jnp.ndarray] = [unfold_frames(x, f)]

        # pyramid (pose_guider.py:52-89): stage i outputs nc * 2^min(i, n-2)
        # (reference n=4: nc, 2nc, 4nc, 4nc); the LAST stage is unstrided and
        # keeps its input width (only the strided second conv changes
        # channels), so the final two stages share a width — mirroring the
        # SD block_out_channels pattern (…, 1280, 1280)
        n = self.num_stages
        outs = [nc * (2 ** min(i, n - 2)) for i in range(n)] if n >= 2 else [nc]
        ins = [nc] + outs[:-1]
        pyramid = [
            (ins[i], outs[i], 2 if i < n - 1 else None) for i in range(n)
        ]
        for i, (c_in, c_out, s2) in enumerate(pyramid):
            x = ConvBNRelu(c_in, 3, 1, dtype=self.dtype, name=f"pyr_{i}_0")(x, train)
            if s2 is not None:
                x = ConvBNRelu(c_out, 3, s2, dtype=self.dtype, name=f"pyr_{i}_1")(x, train)
            if self.use_ca:
                x = PoseGuiderTransformer(
                    channels=x.shape[-1],
                    heads=self.attn_heads,
                    dim_head=self.attn_dim_head,
                    dtype=self.dtype,
                    name=f"cross_attn_{i + 1}",
                )(x)
            fea.append(unfold_frames(x, f))

        return fea
