"""AnimateDiff-style temporal motion module (flax, channels-last).

Parity target: reference ``src/models/motion_module.py`` —
``VanillaTemporalModule`` wrapping ``TemporalTransformer3DModel``:
GroupNorm (per-frame) -> Linear proj_in -> N x TemporalTransformerBlock
(2x temporal self-attention + GEGLU FF) -> zero-init Linear proj_out ->
residual.  Temporal attention runs over the frame axis per spatial location
with an interleaved sinusoidal positional encoding
(motion_module.py:262-277, 351-388; shipped config: 8 heads, 1 block,
PE max_len 32 — configs/inference/inference_v2.yaml:14-21).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from aniportrait_tpu.models.attention import CrossAttention, FeedForward, _ln
from aniportrait_tpu.models.embeddings import sinusoidal_positional_encoding
from aniportrait_tpu.models.resnet import fold_frames, group_norm, unfold_frames

# test hook: force the general gather/scatter windowing branch even for
# contiguous tables (lets tests check the static-slice fast path against it)
_FORCE_GATHER_FALLBACK = False


class TemporalTransformerBlock(nn.Module):
    """2x (LayerNorm -> temporal self-attn (+PE) -> residual) -> FF."""

    dim: int
    heads: int
    num_attention_blocks: int = 2
    pe_max_len: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, F, S, C) temporal activations in natural layout (the
        frame axis stays where the UNet produces it; attention runs across
        F per spatial position S via the natural-layout kernel)."""
        f = x.shape[1]
        pe = jnp.asarray(
            sinusoidal_positional_encoding(self.pe_max_len, self.dim)[:, :f]
        )  # (1, f, c)
        for i in range(self.num_attention_blocks):
            h = _ln(f"norm_{i}")(x).astype(self.dtype)
            h = h + pe[:, :, None, :].astype(self.dtype)  # PE on normed input
            x = x + CrossAttention(
                self.dim,
                self.heads,
                self.dim // self.heads,
                dtype=self.dtype,
                name=f"attn_{i}",
            )(h)
        h = _ln("ff_norm")(x).astype(self.dtype)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class MotionModule(nn.Module):
    """Temporal transformer on (b, f, h, w, c); returns same shape.

    proj_out is zero-initialised (motion_module.py:72-75) so an untrained
    motion module is an identity — load-bearing for stage-2 training and
    for running the stage-1 graph with motion disabled.
    """

    channels: int
    heads: int = 8
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    pe_max_len: int = 32
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, windows=None):
        """x: (b, f, h, w, c).  windows: optional (n_win, win_len) int32
        frame-index array — window-fused temporal attention (the pipeline's
        opt-in overlap-aware mode): the transformer blocks see each window
        as an independent sequence (PE indexed by within-window position,
        exactly like the reference's per-window UNet calls), and frames in
        window overlaps average their per-window hidden states before
        proj_out.  With non-overlapping windows covering every frame once
        this is numerically the per-window computation; with overlaps it
        approximates the reference's end-of-UNet prediction averaging at
        each motion module instead (quality-gated in the pipeline)."""
        b, f, h, w, c = x.shape
        residual = x

        scale = self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32)
        hid = unfold_frames(
            group_norm(fold_frames(x), scale, bias, self.norm_groups, 1e-6), f
        )

        # (b, f, h, w, c) -> (b, f, h*w, c): natural layout preserved — the
        # temporal attention kernel reads frames-major blocks directly, so
        # no (b,f,s,c) -> (b*s,f,c) transpose is ever materialised
        hid = hid.reshape(b, f, h * w, c)
        hid = nn.Dense(c, dtype=self.dtype, name="proj_in")(hid)

        if windows is not None:
            n_win, win_len = windows.shape
            win_np = np.asarray(windows)  # STATIC table (pipeline passes numpy)
            # every frame must be covered by >= 1 window: an uncovered frame
            # would divide by zero in the overlap reassembly below (trace-time
            # ZeroDivisionError on the contiguous path, silent NaN on the
            # gather path) — fail loudly at trace time instead
            cov = np.zeros((f,), np.int64)
            np.add.at(cov, win_np.reshape(-1), 1)
            if (cov == 0).any():
                raise ValueError(
                    "motion window table leaves frames uncovered: "
                    f"{np.nonzero(cov == 0)[0].tolist()} (of {f} frames; "
                    f"table shape {win_np.shape})"
                )
            starts = win_np[:, 0]
            contiguous = bool(
                (win_np == starts[:, None] + np.arange(win_len)[None]).all()
            ) and not _FORCE_GATHER_FALLBACK
            if contiguous:
                # static slices, not a gather: each window is a contiguous
                # frame range, so the windowed copy is n_win linear slices
                # (XLA fuses/pipelines these; the gather lowering did a full
                # scatter-style HBM pass per motion module)
                hid = jnp.stack(
                    [
                        lax.slice_in_dim(hid, int(s), int(s) + win_len, axis=1)
                        for s in starts
                    ],
                    axis=1,
                )  # (b, n_win, win_len, s, c)
            else:
                hid = hid[:, jnp.asarray(win_np)]
            hid = hid.reshape(b * n_win, win_len, h * w, c)

        for i in range(self.num_transformer_blocks):
            hid = TemporalTransformerBlock(
                dim=c,
                heads=self.heads,
                num_attention_blocks=self.num_attention_blocks,
                pe_max_len=self.pe_max_len,
                dtype=self.dtype,
                name=f"block_{i}",
            )(hid)

        if windows is not None:
            hid = hid.reshape(b, n_win, win_len, h * w, c)
            # overlap counts are a trace-time constant of the static table
            cnt = np.zeros((f,), np.float32)
            np.add.at(cnt, win_np.reshape(-1), 1.0)
            if contiguous:
                # piecewise static reassembly: group output frames into
                # maximal runs covered by the same window set; a run covered
                # by ONE window is a pure slice (no arithmetic), an overlap
                # run is the f32 mean of its (typically two) window slices —
                # one fused elementwise pass, ~1x bf16 write traffic.  The
                # earlier formulation accumulated every window into a full
                # (b, f, s, c) f32 buffer, ~4x the HBM traffic per motion
                # module (~0.5 GB at top resolution for a 48-frame clip).
                cover = [[] for _ in range(f)]  # frame -> [(win, pos)]
                for wi, s in enumerate(starts):
                    for p in range(win_len):
                        cover[int(s) + p].append((wi, p))
                key = [tuple((wi, p - fr) for wi, p in cover[fr]) for fr in range(f)]
                segs, a = [], 0
                for fr in range(1, f + 1):
                    if fr == f or key[fr] != key[a]:
                        runs = cover[a]  # [(win, pos-of-frame-a)]
                        w0 = 1.0 / len(runs)
                        parts = [
                            lax.slice_in_dim(hid[:, wi], p, p + (fr - a), axis=1)
                            for wi, p in runs
                        ]
                        if len(parts) == 1:
                            segs.append(parts[0])
                        else:
                            # mean in the ACTIVATION dtype: an f32
                            # accumulator here made XLA hoist the f32
                            # convert into the producer fusions, so every
                            # windowed block residual was WRITTEN f32 —
                            # +0.7 s/clip of pure HBM traffic in the
                            # 24-frame fused trace.  A 2-term bf16 mean
                            # costs one rounding step (quality-gated with
                            # the rest of the fused approximation).
                            acc = parts[0]
                            for q in parts[1:]:
                                acc = acc + q
                            segs.append(acc * jnp.asarray(w0, hid.dtype))
                        a = fr
                hid = jnp.concatenate(segs, axis=1)  # (b, f, s, c)
            else:
                win_j = jnp.asarray(win_np)
                acc = jnp.zeros((b, f, h * w, c), jnp.float32)
                acc = acc.at[:, win_j.reshape(-1)].add(
                    hid.astype(jnp.float32).reshape(b, n_win * win_len, h * w, c)
                )
                hid = (acc / jnp.asarray(cnt)[None, :, None, None]).astype(
                    hid.dtype
                )

        hid = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out"
        )(hid)
        return residual + hid.reshape(b, f, h, w, c)
