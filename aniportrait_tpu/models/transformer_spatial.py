"""Per-frame spatial transformer over 5-D video tensors (flax).

Parity target: reference ``src/models/transformer_3d.py`` (Transformer3DModel)
and the 2D variant used by the ReferenceNet (``src/models/transformer_2d.py``):
GroupNorm (per-frame) -> 1x1 proj_in -> token transformer block(s) ->
1x1 proj_out -> residual.  SD-1.5 uses ``use_linear_projection=False`` (1x1
convs); as 1x1 convs on tokens == Dense, we use Dense and the weight
converter squeezes the conv kernels.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.models.attention import SpatialTransformerBlock
from aniportrait_tpu.models.resnet import fold_frames, group_norm, unfold_frames


class SpatialTransformer(nn.Module):
    """Spatial attention applied per frame on (b, f, h, w, c).

    In "write" mode (capture_bank=True) returns the per-block normed hidden
    states for the reference-attention bank; in "read" mode consumes
    ``ref_bank``.
    """

    channels: int
    heads: int
    cross_attention_dim: Optional[int] = 768
    num_blocks: int = 1
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        ref_bank=None,
        drop_ref=None,
        capture_bank: bool = False,
        drop_mode: str = "traced",
    ):
        """
        Args:
          x: (b, f, h, w, c) hidden states.
          context: (b, S_ctx, ctx_dim) CLIP tokens (tiled over frames here).
          ref_bank: (b, L_ref, c) reference features for attn1 K/V.
          drop_ref: (b,) bool CFG mask.
        Returns: (x, banks) where banks is a list (len num_blocks) or [].
        """
        b, f, h, w, c = x.shape
        residual = x

        scale = self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32)
        hid = group_norm(fold_frames(x), scale, bias, self.norm_groups, 1e-6)

        hid = hid.reshape(b * f, h * w, c)
        hid = nn.Dense(c, dtype=self.dtype, name="proj_in")(hid)

        if context is not None and context.shape[0] != b * f:
            context = jnp.repeat(context, f, axis=0)

        banks = []
        for i in range(self.num_blocks):
            hid, bank = SpatialTransformerBlock(
                dim=c,
                heads=self.heads,
                dim_head=c // self.heads,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                hid,
                context=context,
                ref_bank=ref_bank,
                drop_ref=drop_ref,
                video_length=f,
                capture_bank=capture_bank,
                drop_mode=drop_mode,
            )
            if bank is not None:
                # bank is (b*f, hw, c); the writer always runs with f == 1
                banks.append(bank)

        hid = nn.Dense(c, dtype=self.dtype, name="proj_out")(hid)
        hid = unfold_frames(hid.reshape(b * f, h, w, c), f)
        return residual + hid, banks
