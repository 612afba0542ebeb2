"""CLIP vision encoder with projection (flax).

Parity target: the HF ``CLIPVisionModelWithProjection`` image encoder the
reference loads from ``sd-image-variations-diffusers`` at
``scripts/pose2vid.py:79-81`` (ViT-L/14: hidden 1024, 24 layers, 16 heads,
patch 14, image 224, projection_dim 768, quick_gelu).  The pipelines use the
projected ``image_embeds`` as a single encoder token
(reference pipeline_pose2vid_long.py:379-385).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.ops.attention import scaled_dot_product_attention

# OpenAI CLIP preprocessing constants (CLIPImageProcessor defaults)
CLIP_IMAGE_SIZE = 224
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x).astype(self.dtype)
        b, s, c = h.shape
        d = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(h).reshape(b, s, self.heads, d)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(h).reshape(b, s, self.heads, d)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(h).reshape(b, s, self.heads, d)
        a = scaled_dot_product_attention(q, k, v).reshape(b, s, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(a)

        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionModelWithProjection(nn.Module):
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    patch: int = 14
    image_size: int = 224
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (b, 224, 224, 3), CLIP-normalised.
        Returns: image_embeds (b, projection_dim)."""
        b = pixel_values.shape[0]
        n = (self.image_size // self.patch) ** 2

        patches = nn.Conv(
            self.hidden,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, n, self.hidden)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden,), jnp.float32
        )
        cls = jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, self.hidden))
        x = jnp.concatenate([cls, patches], axis=1)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n + 1, self.hidden),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)[None]

        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x).astype(self.dtype)
        for i in range(self.layers):
            x = CLIPEncoderLayer(
                self.hidden, self.heads, self.intermediate, dtype=self.dtype,
                name=f"layer_{i}",
            )(x)

        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0]).astype(
            self.dtype
        )
        return nn.Dense(
            self.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, 3) uint8/float [0,255] or [0,1] -> CLIP-normalised 224x224.

    Matches CLIPImageProcessor: resize shortest side to 224 (bicubic),
    center-crop 224, scale to [0,1], normalise.  Caller should resize first
    for exactness; this helper handles already-224 inputs + normalisation.
    """
    x = images.astype(jnp.float32)
    if x.max() > 1.5:  # heuristically 0-255
        x = x / 255.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
