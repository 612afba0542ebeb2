"""FiLM frame-interpolation network (flax, NHWC).

Parity target: the TorchScript ``film_net_fp16.pt`` the reference loads at
``src/utils/frame_interpolation.py:11-19`` — the dajes/frame-interpolation-
pytorch port of Google's FiLM ("Frame Interpolation for Large Motion",
Reda et al., ECCV 2022; google-research/frame-interpolation ``film_net``).
The shipped blob is absent from the snapshot, so the architecture follows
the published film_net config (pyramid_levels=7, fusion_pyramid_levels=5,
specialized_levels=3, sub_levels=4, filters=64, flow_convs=(3,3,3,3),
flow_filters=(32,64,128,256)) and is parity-tested against an in-repo torch
oracle with the same structure (tests/oracles/film_torch.py); the weight
converter (weights/convert.py:convert_film) maps that state_dict layout.

Structure:
  * cascaded feature pyramid: ONE shared SubTreeExtractor runs on every
    image-pyramid level; the level-k feature map concatenates same-resolution
    sub-features extracted from pyramid images k, k-1, ..., k-3.
  * coarse-to-fine residual flow: specialized flow CNNs at the 3 finest
    levels, one shared CNN for all coarser levels.
  * fusion: U-Net style decoder over the 5-level aligned pyramid
    (warped images + warped features + both flows), nearest-neighbour
    upsampling with a 2x2 'SAME' conv, 3 output channels.

Conventions (matching the torch oracle; document-level assumptions since the
blob is unavailable): hidden convs use leaky_relu(0.2); flow/fusion output
convs are linear; warp displaces by flow channels (dy, dx) and samples
bilinearly with edge clamping (border padding, align_corners grid).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def avg_pool_2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def build_image_pyramid(image: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    pyr = []
    for i in range(levels):
        pyr.append(image)
        if i < levels - 1:
            image = avg_pool_2x(image)
    return pyr


def warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow``: out(y, x) = image(y + fy, x + fx).

    image: (B, H, W, C); flow: (B, H, W, 2) with channels (dy, dx) in pixels.
    Bilinear sampling, coordinates clamped to the border.
    """
    b, h, w, c = image.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = gy[None] + flow[..., 0]
    x = gx[None] + flow[..., 1]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    # ONE gather fetching the contiguous 2x2xC neighbourhood per output
    # pixel (slice_sizes).  TPU gathers are index-descriptor-bound
    # (~15-20 ns per index measured on v5e regardless of layout), so one
    # windowed gather is ~4x cheaper than four per-neighbour gathers —
    # in-net this was 69% of FiLM device time.  The window start is clamped
    # to [0, dim-2] and the in-window offset (0 or 1) selected afterwards,
    # which also realises the border clamp: at y0 == h-1 both bilinear rows
    # read the last row (win row 1), exactly the old min(y0+1, h-1).
    y0c = jnp.minimum(y0, h - 2)
    x0c = jnp.minimum(x0, w - 2)
    oy = (y0 - y0c) > 0  # (B, H, W) bool: y0 sits on win row 1
    ox = (x0 - x0c) > 0
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None], (b, h, w)
    )
    starts = jnp.stack([bidx, y0c, x0c], axis=-1).reshape(-1, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    win = jax.lax.gather(
        image, starts, dn, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,  # starts clamped
    ).reshape(b, h, w, 2, 2, c)
    r0 = jnp.where(oy[..., None, None], win[:, :, :, 1], win[:, :, :, 0])
    r1 = win[:, :, :, 1]  # row y0+1 (== y0 when clamped: weight-safe)
    oxc = ox[..., None]
    v00 = jnp.where(oxc, r0[:, :, :, 1], r0[:, :, :, 0])
    v01 = r0[:, :, :, 1]
    v10 = jnp.where(oxc, r1[:, :, :, 1], r1[:, :, :, 0])
    v11 = r1[:, :, :, 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(image.dtype)


def flow_pyramid_synthesis(residual_pyramid: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Coarsest residual IS the flow; finer flows = residual + 2x upsampled."""
    flow = residual_pyramid[-1]
    out = [flow]
    for residual in residual_pyramid[-2::-1]:
        h, w = residual.shape[1:3]
        flow = residual + 2.0 * jax.image.resize(
            flow, (flow.shape[0], h, w, 2), method="bilinear"
        )
        out.insert(0, flow)
    return out


class SubTreeExtractor(nn.Module):
    """Shared conv cascade: sub-level i = two 3x3 convs at filters<<i, with
    2x average pooling between sub-levels."""

    filters: int = 64
    sub_levels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, n: int) -> List[jnp.ndarray]:
        head = image
        pyramid = []
        for i in range(self.sub_levels):
            if i >= n:
                break
            head = _leaky(nn.Conv(self.filters << i, (3, 3), dtype=self.dtype,
                                  name=f"conv_{i}_0")(head))
            head = _leaky(nn.Conv(self.filters << i, (3, 3), dtype=self.dtype,
                                  name=f"conv_{i}_1")(head))
            pyramid.append(head)
            if i < n - 1:
                head = avg_pool_2x(head)
        return pyramid


class FeatureExtractor(nn.Module):
    filters: int = 64
    sub_levels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_pyramid: List[jnp.ndarray]) -> List[jnp.ndarray]:
        sub = SubTreeExtractor(self.filters, self.sub_levels, dtype=self.dtype,
                               name="sub")
        levels = len(image_pyramid)
        sub_pyramids = [
            sub(image_pyramid[i], min(levels - i, self.sub_levels))
            for i in range(levels)
        ]
        feature_pyramid = []
        for i in range(levels):
            features = sub_pyramids[i][0]
            for j in range(1, self.sub_levels):
                if j <= i:
                    features = jnp.concatenate(
                        [features, sub_pyramids[i - j][j]], axis=-1
                    )
            feature_pyramid.append(features)
        return feature_pyramid


class FlowEstimator(nn.Module):
    num_convs: int
    num_filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features_a, features_b):
        x = jnp.concatenate([features_a, features_b], axis=-1)
        for i in range(self.num_convs):
            x = _leaky(nn.Conv(self.num_filters, (3, 3), dtype=self.dtype,
                               name=f"conv_{i}")(x))
        x = _leaky(nn.Conv(self.num_filters // 2, (1, 1), dtype=self.dtype,
                           name="conv_bottleneck")(x))
        # flow output: linear, f32 (small magnitudes accumulate across levels)
        return nn.Conv(2, (1, 1), dtype=jnp.float32, name="conv_out")(x)


class PyramidFlowEstimator(nn.Module):
    flow_convs: Sequence[int] = (3, 3, 3, 3)
    flow_filters: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_a: List[jnp.ndarray], pyramid_b: List[jnp.ndarray]):
        specialized = len(self.flow_convs) - 1
        predictors = [
            FlowEstimator(self.flow_convs[i], self.flow_filters[i],
                          dtype=self.dtype, name=f"predictor_{i}")
            for i in range(specialized)
        ]
        shared = FlowEstimator(self.flow_convs[-1], self.flow_filters[-1],
                               dtype=self.dtype, name="predictor_shared")
        levels = len(pyramid_a)
        picks = [predictors[i] if i < specialized else shared
                 for i in range(levels)]

        v = picks[-1](pyramid_a[-1], pyramid_b[-1])
        residuals = [v]
        for i in reversed(range(levels - 1)):
            h, w = pyramid_a[i].shape[1:3]
            v = 2.0 * jax.image.resize(
                v, (v.shape[0], h, w, 2), method="bilinear"
            )
            warped = warp(pyramid_b[i], v)
            v_residual = picks[i](pyramid_a[i], warped)
            residuals.insert(0, v_residual)
            v = v_residual + v
        return residuals


class Fusion(nn.Module):
    """U-Net decoder over the aligned pyramid -> RGB."""

    fusion_pyramid_levels: int = 5
    specialized_levels: int = 3
    filters: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray]) -> jnp.ndarray:
        levels = self.fusion_pyramid_levels
        net = pyramid[-1]
        for i in reversed(range(levels - 1)):
            m = (self.filters << i if i < self.specialized_levels
                 else self.filters << self.specialized_levels)
            h, w = pyramid[i].shape[1:3]
            net = jax.image.resize(
                net, (net.shape[0], h, w, net.shape[-1]), method="nearest"
            )
            # TF 'SAME' on an even kernel pads (0,1),(0,1)
            net = nn.Conv(m, (2, 2), padding=((0, 1), (0, 1)), dtype=self.dtype,
                          name=f"up_conv_{i}")(net)
            net = jnp.concatenate([pyramid[i], net], axis=-1)
            net = _leaky(nn.Conv(m, (3, 3), dtype=self.dtype,
                                 name=f"conv_{i}_0")(net))
            net = _leaky(nn.Conv(m, (3, 3), dtype=self.dtype,
                                 name=f"conv_{i}_1")(net))
        return nn.Conv(3, (1, 1), dtype=jnp.float32, name="output_conv")(net)


class FilmInterpolator(nn.Module):
    """model(x0, x1, dt) -> midpoint frame at time dt in (0, 1).

    x0/x1: (B, H, W, 3) in [0, 1]; H and W must be divisible by
    2**(pyramid_levels-1) = 64 (the reference's 512x512 flow qualifies; pad
    otherwise, as the upstream port's ``pad_batch`` does).
    """

    pyramid_levels: int = 7
    fusion_pyramid_levels: int = 5
    specialized_levels: int = 3
    sub_levels: int = 4
    filters: int = 64
    flow_convs: Sequence[int] = (3, 3, 3, 3)
    flow_filters: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray, dt) -> jnp.ndarray:
        fuse_n = self.fusion_pyramid_levels
        dt = jnp.asarray(dt, jnp.float32).reshape(-1, 1, 1, 1)

        pyr0 = build_image_pyramid(x0.astype(self.dtype), self.pyramid_levels)
        pyr1 = build_image_pyramid(x1.astype(self.dtype), self.pyramid_levels)

        extract = FeatureExtractor(self.filters, self.sub_levels,
                                   dtype=self.dtype, name="extract")
        feat0 = extract(pyr0)
        feat1 = extract(pyr1)

        predict_flow = PyramidFlowEstimator(
            tuple(self.flow_convs), tuple(self.flow_filters),
            dtype=self.dtype, name="predict_flow",
        )
        fwd_residual = predict_flow(feat0, feat1)
        bwd_residual = predict_flow(feat1, feat0)

        fwd_flow = flow_pyramid_synthesis(fwd_residual)[:fuse_n]
        bwd_flow = flow_pyramid_synthesis(bwd_residual)[:fuse_n]

        # time-scaled flows: backward flow (0 -> 1 motion) scaled by t moves
        # image0 to time t; forward flow scaled by (1 - t) moves image1 back
        bwd_flow = [f * dt for f in bwd_flow]
        fwd_flow = [f * (1.0 - dt) for f in fwd_flow]

        to_warp0 = [
            jnp.concatenate([pyr0[i].astype(self.dtype), feat0[i]], axis=-1)
            for i in range(fuse_n)
        ]
        to_warp1 = [
            jnp.concatenate([pyr1[i].astype(self.dtype), feat1[i]], axis=-1)
            for i in range(fuse_n)
        ]
        warped0 = [warp(to_warp0[i], bwd_flow[i]) for i in range(fuse_n)]
        warped1 = [warp(to_warp1[i], fwd_flow[i]) for i in range(fuse_n)]

        aligned = [
            jnp.concatenate(
                [warped0[i], warped1[i],
                 bwd_flow[i].astype(self.dtype), fwd_flow[i].astype(self.dtype)],
                axis=-1,
            )
            for i in range(fuse_n)
        ]
        fuse = Fusion(self.fusion_pyramid_levels, self.specialized_levels,
                      self.filters, dtype=self.dtype, name="fuse")
        return fuse(aligned)
