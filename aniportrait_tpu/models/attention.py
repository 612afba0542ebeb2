"""Transformer blocks for the diffusion UNets (flax).

Parity targets (reference, reimplemented TPU-first — channels-last, functional
reference-feature passing instead of monkey-patched banks):
  * ``CrossAttention``  ~ diffusers ``Attention`` (to_q/to_k/to_v/to_out).
  * ``FeedForward``/``GEGLU`` ~ diffusers feed-forward (geglu).
  * ``SpatialTransformerBlock`` unifies the reference's
    ``BasicTransformerBlock`` (src/models/attention.py:14-297, ReferenceNet
    writer) and ``TemporalBasicTransformerBlock`` (attention.py:300-445,
    denoising-UNet reader) — the two have identical parameters; only the
    runtime behaviour differs:
      - ``capture_bank=True`` returns the post-norm1 hidden states, the exact
        tensor the reference writer appends to ``module.bank``
        (mutual_self_attention.py:138);
      - ``ref_bank=...`` concatenates reference features into the
        self-attention K/V (mutual_self_attention.py:147-165), with
        CFG-unconditional rows masked back to self-only attention via an
        additive bias (equivalent to the boolean-indexed re-attention at
        mutual_self_attention.py:166-186).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from aniportrait_tpu.ops.attention import (
    FLASH_MIN_LOGITS,
    _on_accelerator,
    interpret_default,
    scaled_dot_product_attention,
    temporal_attention_4d,
)

NEG_INF = -1e9


class CrossAttention(nn.Module):
    """Multi-head attention with separate q and kv inputs.

    Param names mirror the torch module for weight conversion:
    ``to_q``, ``to_k``, ``to_v``, ``to_out_0``.
    """

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # informational; kv dim from input
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask_bias=None, kv_split=None,
                 drop_tail=None, extra_kv=None, extra_repeat: int = 1):
        """
        Args:
          x: (B, Sq, C) queries.
          context: (B, Skv, Ckv) or None for self-attention.
          mask_bias: optional additive bias broadcastable to (B, H, Sq, Skv).
          kv_split/drop_tail: reference-KV mode (see
            ops.attention.scaled_dot_product_attention).
          extra_kv: optional (B', L, C) tokens appended to K/V AFTER
            projection (projecting separately == projecting the concat,
            since to_k/to_v are per-token linear).  The reference banks go
            through here UNREPEATED: the projection is done once per batch
            row instead of once per (batch x frame) row, and — being
            denoise-loop-invariant — XLA hoists it out of the sampler scan
            entirely (the concat-then-project form recomputed ~270 GFLOP of
            bank projections every step).
          extra_repeat: row-tile factor applied to the projected extra K/V
            (frames per batch row).
        """
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_q")(x)
        to_k = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_v")
        k = to_k(context)
        v = to_v(context)
        if x.ndim == 4:
            # (b, f, s, c) natural-layout temporal self-attention (motion
            # module): sequences along the frame axis per spatial position
            out = temporal_attention_4d(q, k, v, self.heads)
            return nn.Dense(
                inner, use_bias=True, dtype=self.dtype, name="to_out_0"
            )(out)
        if extra_kv is not None:
            ke = to_k(extra_kv)
            ve = to_v(extra_kv)
            if (
                mask_bias is None
                and kv_split is None
                and drop_tail is None
                # per-row logits are Sq x (S_self + S_bank) regardless of
                # extra_repeat (the repeat tiles the BATCH axis) — same
                # threshold as the concat path below
                and q.shape[1] * (k.shape[1] + ke.shape[1])
                >= FLASH_MIN_LOGITS
                and self.dim_head <= 256
                # c=640 would need a block_kv shrink to fit the 4 double-
                # buffered KV refs in VMEM, and the shrunk kernel measured
                # SLOWER than concat+tok_flash (4.01 vs 3.40 ms) — banked
                # only wins at the top-res width
                and inner <= 320
                and _on_accelerator()
            ):
                # two-segment flash: the bank KV stays UNREPEATED and
                # UNCONCATENATED — the kernel walks self blocks then bank
                # blocks with shared accumulators (bit-comparable to the
                # concat form).  The concat was rebuilt every denoise step
                # per reference-reading layer (~0.15 s/clip of HBM writes).
                # Operands go in CHANNEL-MAJOR: swapaxes of the projection
                # dots' natural {1,2,0} layout is a free bitcast, deleting
                # the per-operand relayout copy into the Pallas call (30 x
                # 42 MB per denoise step at top res in the r4 trace).
                from aniportrait_tpu.ops.pallas_attention import (
                    tok_flash_banked_t,
                )

                out = tok_flash_banked_t(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), jnp.swapaxes(ke, 1, 2),
                    jnp.swapaxes(ve, 1, 2), self.heads, extra_repeat,
                    512, 1024, interpret_default(),
                )
                return nn.Dense(
                    inner, use_bias=True, dtype=self.dtype, name="to_out_0"
                )(out)
            ke = jnp.repeat(ke, extra_repeat, axis=0)
            ve = jnp.repeat(ve, extra_repeat, axis=0)
            if kv_split is not None or drop_tail is not None:
                kv_split = k.shape[1]
            k = jnp.concatenate([k, ke], axis=1)
            v = jnp.concatenate([v, ve], axis=1)
        if (
            mask_bias is None
            and kv_split is None
            and drop_tail is None
            and q.shape[1] * k.shape[1] >= FLASH_MIN_LOGITS
            and self.dim_head <= 256
            and inner <= 640  # wider channels exceed the 16M VMEM budget
            and _on_accelerator()
        ):
            # token-layout flash kernel: blocks cut straight from the
            # projections, heads sliced in-kernel — avoids the (B, S, H,
            # D) head-fold transpose copies in HBM (~11 ms/step in the
            # trace); bit-exact vs the folded kernel.  At inner<=320 the
            # projection dots emit channel-major, so channel-major kernel
            # operands make the swapaxes a free bitcast; at c=640 XLA emits
            # the dots TOKEN-major and the transposed form would pay the
            # copy instead (r4 trace: 20 x 1.3 MB/step) — keep token-major
            # there.
            if inner <= 320:
                from aniportrait_tpu.ops.pallas_attention import tok_flash_t

                out = tok_flash_t(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), self.heads,
                    512, 1024, interpret_default(),
                )
            else:
                from aniportrait_tpu.ops.pallas_attention import tok_flash

                out = tok_flash(q, k, v, self.heads,
                                512, 1024, interpret_default())
            return nn.Dense(
                inner, use_bias=True, dtype=self.dtype, name="to_out_0"
            )(out)
        b, sq = q.shape[0], q.shape[1]
        skv = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, skv, self.heads, self.dim_head)
        v = v.reshape(b, skv, self.heads, self.dim_head)
        out = scaled_dot_product_attention(
            q, k, v, bias=mask_bias, kv_split=kv_split, drop_tail=drop_tail
        )
        out = out.reshape(b, sq, inner)
        return nn.Dense(inner, use_bias=True, dtype=self.dtype, name="to_out_0")(out)


class _GegluProj(nn.Module):
    """``Dense(2N)`` evaluated as two N-wide dots + gelu-multiply.

    Same params (``kernel (C, 2N)``, ``bias (2N,)``) and bit-identical dot
    math as a single Dense followed by split — but the single-Dense form
    made XLA write AND re-read the full 2N-wide intermediate (671 MB each
    way per top-res FF call in the r3 trace, ~1.5 ms of the 2.7 ms call);
    as two dots the gelu-multiply fuses into the gate dot's epilogue and
    only the N-wide halves touch HBM."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.dim_out
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (jnp.shape(x)[-1], 2 * n),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros_init(), (2 * n,),
                       jnp.float32)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
        h = x @ w[:, :n] + b[:n]
        gate = x @ w[:, n:] + b[n:]
        return h * nn.gelu(gate)


class GEGLU(nn.Module):
    """x -> proj -> split -> x * gelu(gate). Torch name: ``proj``."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _GegluProj(self.dim_out, dtype=self.dtype, name="proj")(x)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4. Torch names: ``net_0`` (GEGLU), ``net_2``."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x


def _ln(name):
    # LayerNorm stats in fp32 for stability; torch default eps=1e-5.
    return nn.LayerNorm(epsilon=1e-5, name=name)


class SpatialTransformerBlock(nn.Module):
    """norm1/attn1 (self, optionally +ref KV) -> norm2/attn2 (cross) ->
    norm3/ff.  See module docstring for the write/read duality."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        ref_bank=None,
        drop_ref=None,
        video_length: int = 1,
        capture_bank: bool = False,
        drop_mode: str = "traced",
    ):
        """
        Args:
          x: (B*F, S, C) tokens (F=1 for 2D/reference use).
          context: (B*F, S_ctx, ctx_dim) CLIP tokens, or None.
          ref_bank: optional (B, L_ref, C) reference features.
          drop_ref: optional (B,) bool; True rows ignore ref tokens.
          video_length: F (static).
          capture_bank: return post-norm1 hidden states as bank.
          drop_mode: 'traced' (mask per drop_ref), or STATIC structure
            knowledge that avoids wasted attention compute:
            'none' (no rows drop), 'first_half' (CFG layout: the first B/2
            batch rows drop — uncond rows get a self-only call, cond rows a
            concat call, exactly the reference's two computations).
        Returns: (x, bank_or_None)
        """
        bank = None
        h = _ln("norm1")(x).astype(self.dtype)
        if capture_bank:
            bank = h

        attn1 = CrossAttention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )
        if ref_bank is None:
            x = x + attn1(h)
        else:
            bank = ref_bank.astype(self.dtype)  # (B, L, C) — UNREPEATED;
            # projection happens inside attn1 (extra_kv), once per batch
            # row, hoistable out of the denoise scan
            if drop_mode == "none":
                x = x + attn1(h, extra_kv=bank, extra_repeat=video_length)
            elif drop_mode == "first_half":
                # batch rows are (B, F) flattened with F contiguous; the
                # uncond half is the first B/2 batch rows == first half of
                # the flattened rows
                half = h.shape[0] // 2
                half_b = bank.shape[0] // 2
                h_u, h_c = h[:half], h[half:]
                out_u = attn1(h_u)
                out_c = attn1(
                    h_c, extra_kv=bank[half_b:], extra_repeat=video_length
                )
                x = x + jnp.concatenate([out_u, out_c], axis=0)
            else:  # 'traced'
                if drop_ref is not None:
                    row_drop = jnp.repeat(drop_ref, video_length, axis=0)
                else:
                    row_drop = jnp.zeros((h.shape[0],), bool)
                # kv_split is derived inside attn1 (self-token count)
                x = x + attn1(
                    h, extra_kv=bank, extra_repeat=video_length,
                    drop_tail=row_drop,
                )

        if self.cross_attention_dim is not None:
            h = _ln("norm2")(x).astype(self.dtype)
            x = x + CrossAttention(
                self.dim,
                self.heads,
                self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name="attn2",
            )(h, context=context)

        h = _ln("norm3")(x).astype(self.dtype)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x, bank
