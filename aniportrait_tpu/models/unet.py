"""Unified SD-1.5-family UNet (flax, channels-last, video-native).

One class covers the reference's three UNet variants:
  * ReferenceNet (reference ``src/models/unet_2d_condition.py``): run with
    ``video_length==1``, ``capture_banks=True``, no motion module, and no
    output head (the reference removes ``conv_norm_out``/``conv_out``,
    unet_2d_condition.py:645-652) — the return value is the pytree of
    per-block normed hidden states ("banks").
  * Stage-1 denoising UNet (reference ``src/models/unet_3d.py`` without
    motion modules, train_stage_1.py:273-281): ``use_motion_module=False``,
    reads banks, consumes pose features, has the output head.
  * Stage-2 / inference denoising UNet (unet_3d.py + motion_module.py):
    ``use_motion_module=True``.

Topology (SD-1.5, block_out_channels 320/640/1280/1280, unet_3d.py:44-66):
  down: 3x CrossAttn(2 layers) + plain(2 layers), downsample between;
  mid:  resnet - attn - [motion] - resnet;
  up:   plain(3 layers) + 3x CrossAttn(3 layers), upsample between;
  pose features added after conv_in and after each down block
  (unet_3d.py:484-510).

Bank keys are structural positions (``down_{i}_{j}``, ``mid_0``,
``up_{i}_{j}``); the reference pairs writer/reader blocks by sorting on
channel width with a stable sort (mutual_self_attention.py:302-339), which
for these two isomorphic UNets is exactly the identity pairing on structural
position.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.models.embeddings import TimestepEmbedding, timestep_embedding
from aniportrait_tpu.models.motion_module import MotionModule
from aniportrait_tpu.models.resnet import (
    Downsample3D,
    GroupNorm5D,
    InflatedConv,
    ResnetBlock3D,
    Upsample3D,
)
from aniportrait_tpu.models.transformer_spatial import SpatialTransformer


class AniUNet(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8  # SD-1.5 'attention_head_dim: 8' == 8 heads
    cross_attention_dim: int = 768
    use_motion_module: bool = False
    motion_module_mid_block: bool = True
    motion_module_resolutions: Sequence[int] = (1, 2, 4, 8)
    motion_heads: int = 8
    motion_transformer_blocks: int = 1
    motion_pe_max_len: int = 32
    use_inflated_groupnorm: bool = True
    has_output_head: bool = True
    # remat every resnet/attention/motion block: trades recompute for HBM,
    # the reference's stage-2 lever (configs/train/stage2.yaml:11,
    # unet_3d_blocks.py:411-438) — required to fit 16-frame 512^2 training
    gradient_checkpointing: bool = False
    dtype: jnp.dtype = jnp.float32

    def _motion(self, channels, name):
        cls = (
            nn.remat(MotionModule) if self.gradient_checkpointing else MotionModule
        )
        return cls(
            channels=channels,
            heads=self.motion_heads,
            num_transformer_blocks=self.motion_transformer_blocks,
            pe_max_len=self.motion_pe_max_len,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        pose_cond_fea: Optional[List[jnp.ndarray]] = None,
        ref_banks: Optional[Dict[str, jnp.ndarray]] = None,
        drop_ref: Optional[jnp.ndarray] = None,
        capture_banks: bool = False,
        drop_mode: str = "traced",
        mode: str = "full",
        enc_features=None,
        motion_windows=None,
    ):
        """
        Args:
          sample: (b, f, h, w, 4) noisy latents (f=1 for image mode).
          timesteps: (b,) int32.
          encoder_hidden_states: (b, S, 768) CLIP image tokens.
          pose_cond_fea: optional list of 5 tensors (b, f, h/2^k, w/2^k, c_k)
            with c = (320, 320, 640, 1280, 1280).
          ref_banks: dict of (b, L, c) reference features keyed by position.
          drop_ref: (b,) bool — CFG-uncond rows ignore ref tokens.
          capture_banks: return banks instead of consuming them.
          drop_mode: 'traced' | 'none' | 'first_half' (static CFG layout;
            see SpatialTransformerBlock).
          mode: 'full' | 'encode' | 'decode' — the encoder-cache split
            (Faster Diffusion, arXiv 2312.09608: down+mid features vary
            slowly across adjacent denoise steps; 'encode' returns them,
            'decode' consumes a cached copy and runs only the up path).
            'encode' ∘ 'decode' at the same step is bit-identical to
            'full' (tested).
          enc_features: the (mid_sample, res_stack tuple) from 'encode',
            required for mode='decode'.
          motion_windows: optional (n_win, win_len) int32 frame indices —
            window-fused temporal attention (see MotionModule.__call__);
            the opt-in overlap-aware long-clip mode that replaces the
            per-window UNet loop (reference pipeline_pose2vid_long.py:
            519-548) with ONE whole-clip pass whose motion modules window
            internally.
        Returns: (output or enc_features or None, banks dict)
        """
        ch = list(self.block_out_channels)
        n_down = len(ch)
        banks: Dict[str, jnp.ndarray] = {}
        f = sample.shape[1]

        remat = self.gradient_checkpointing
        ResBlock = nn.remat(ResnetBlock3D) if remat else ResnetBlock3D
        # __call__(self, x, context, ref_bank, drop_ref, capture_bank,
        #          drop_mode): statics are capture_bank and drop_mode
        #          (flax static_argnums count self as 0)
        STrans = (
            nn.remat(SpatialTransformer, static_argnums=(5, 6))
            if remat
            else SpatialTransformer
        )

        def spatial(x, key, context):
            st = STrans(
                channels=x.shape[-1],
                heads=self.attention_heads,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"attn_{key}",
            )
            x, captured = st(
                x,
                context,
                None if ref_banks is None else ref_banks.get(key),
                drop_ref,
                capture_banks,
                drop_mode,
            )
            if captured:
                banks[key] = captured[0]
            return x

        # time embedding (Timesteps + TimestepEmbedding, unet_3d.py:95-98)
        t_emb = timestep_embedding(timesteps, ch[0], flip_sin_to_cos=True)
        emb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        if mode == "decode":
            assert enc_features is not None, "mode='decode' needs enc_features"
            sample, res_tuple = enc_features
            res_stack = list(res_tuple)
        else:
            sample = InflatedConv(ch[0], dtype=self.dtype, name="conv_in")(sample)
            if pose_cond_fea is not None:
                sample = sample + pose_cond_fea[0]

            # ------------------------------------------------------------ down
            res_stack = [sample]
            for i in range(n_down):
                out_c = ch[i]
                has_attn = i < n_down - 1
                res = 2**i
                has_motion = (
                    self.use_motion_module and res in self.motion_module_resolutions
                )
                for j in range(self.layers_per_block):
                    sample = ResBlock(
                        out_channels=out_c,
                        use_inflated_groupnorm=self.use_inflated_groupnorm,
                        dtype=self.dtype,
                        name=f"down_{i}_resnet_{j}",
                    )(sample, emb)
                    if has_attn:
                        sample = spatial(sample, f"down_{i}_{j}", encoder_hidden_states)
                    if has_motion:
                        sample = self._motion(out_c, f"down_{i}_motion_{j}")(
                            sample, motion_windows
                        )
                    res_stack.append(sample)
                if i < n_down - 1:
                    sample = Downsample3D(
                        out_c, dtype=self.dtype, name=f"down_{i}_downsample"
                    )(sample)
                    res_stack.append(sample)
                if pose_cond_fea is not None:
                    sample = sample + pose_cond_fea[i + 1]

            # ------------------------------------------------------------- mid
            mid_c = ch[-1]
            mid_motion = self.use_motion_module and self.motion_module_mid_block
            sample = ResBlock(
                out_channels=mid_c,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                dtype=self.dtype,
                name="mid_resnet_0",
            )(sample, emb)
            sample = spatial(sample, "mid_0", encoder_hidden_states)
            if mid_motion:
                sample = self._motion(mid_c, "mid_motion_0")(sample, motion_windows)
            sample = ResBlock(
                out_channels=mid_c,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                dtype=self.dtype,
                name="mid_resnet_1",
            )(sample, emb)

        if mode == "encode":
            return (sample, tuple(res_stack)), banks

        # ------------------------------------------------------------------ up
        rev = list(reversed(ch))  # (1280, 1280, 640, 320)
        for i in range(n_down):
            out_c = rev[i]
            has_attn = i > 0
            res = 2 ** (n_down - 1 - i)
            has_motion = self.use_motion_module and res in self.motion_module_resolutions
            for j in range(self.layers_per_block + 1):
                skip = res_stack.pop()
                sample = jnp.concatenate([sample, skip], axis=-1)
                sample = ResBlock(
                    out_channels=out_c,
                    use_inflated_groupnorm=self.use_inflated_groupnorm,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(sample, emb)
                if has_attn:
                    sample = spatial(sample, f"up_{i}_{j}", encoder_hidden_states)
                if has_motion:
                    sample = self._motion(out_c, f"up_{i}_motion_{j}")(
                        sample, motion_windows
                    )
            if i < n_down - 1:
                sample = Upsample3D(out_c, dtype=self.dtype, name=f"up_{i}_upsample")(
                    sample
                )

        # ------------------------------------------------------------- output
        if not self.has_output_head:
            return None, banks

        sample = GroupNorm5D(
            32, 1e-5, inflated=self.use_inflated_groupnorm, name="conv_norm_out"
        )(sample)
        sample = nn.silu(sample)
        sample = InflatedConv(self.out_channels, dtype=self.dtype, name="conv_out")(
            sample
        )
        return sample, banks
