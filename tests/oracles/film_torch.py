"""Torch FiLM-net oracle (test-only).

Hand-built mirror of the dajes/frame-interpolation-pytorch port of Google's
film_net — the architecture inside the reference's ``film_net_fp16.pt``
TorchScript blob (loaded at reference ``src/utils/frame_interpolation.py:15``).
The blob itself is absent from the snapshot, so this oracle defines the
state_dict layout that ``aniportrait_tpu.weights.convert.convert_film`` maps,
and the numerical semantics the flax ``FilmInterpolator`` must match.

NCHW, float32. Same config as the flax model: pyramid_levels=7,
fusion_pyramid_levels=5, specialized_levels=3, sub_levels=4, filters=64,
flow_convs=(3,3,3,3), flow_filters=(32,64,128,256).
"""

from __future__ import annotations

from typing import List

import torch
import torch.nn as nn
import torch.nn.functional as F


def _leaky(x):
    return F.leaky_relu(x, negative_slope=0.2)


def build_image_pyramid(image: torch.Tensor, levels: int) -> List[torch.Tensor]:
    pyr = []
    for i in range(levels):
        pyr.append(image)
        if i < levels - 1:
            image = F.avg_pool2d(image, 2, stride=2)
    return pyr


def warp(image: torch.Tensor, flow: torch.Tensor) -> torch.Tensor:
    """out(y, x) = image(y + flow[0], x + flow[1]); bilinear, border clamp."""
    b, c, h, w = image.shape
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=image.dtype),
        torch.arange(w, dtype=image.dtype),
        indexing="ij",
    )
    y = gy[None] + flow[:, 0]
    x = gx[None] + flow[:, 1]
    # normalize to [-1, 1] (align_corners=True mapping)
    y_n = 2.0 * y / max(h - 1, 1) - 1.0
    x_n = 2.0 * x / max(w - 1, 1) - 1.0
    grid = torch.stack([x_n, y_n], dim=-1)  # grid_sample wants (x, y)
    return F.grid_sample(
        image, grid, mode="bilinear", padding_mode="border", align_corners=True
    )


def flow_pyramid_synthesis(residual_pyramid):
    flow = residual_pyramid[-1]
    out = [flow]
    for residual in residual_pyramid[-2::-1]:
        h, w = residual.shape[2:]
        flow = residual + 2.0 * F.interpolate(
            flow, size=(h, w), mode="bilinear", align_corners=False
        )
        out.insert(0, flow)
    return out


class SubTreeExtractor(nn.Module):
    def __init__(self, in_channels=3, filters=64, sub_levels=4):
        super().__init__()
        convs = []
        for i in range(sub_levels):
            convs.append(
                nn.ModuleList([
                    nn.Conv2d(in_channels, filters << i, 3, padding=1),
                    nn.Conv2d(filters << i, filters << i, 3, padding=1),
                ])
            )
            in_channels = filters << i
        self.convs = nn.ModuleList(convs)

    def forward(self, image, n):
        head = image
        pyramid = []
        for i, (c0, c1) in enumerate(self.convs):
            if i >= n:
                break
            head = _leaky(c0(head))
            head = _leaky(c1(head))
            pyramid.append(head)
            if i < n - 1:
                head = F.avg_pool2d(head, 2, stride=2)
        return pyramid


class FeatureExtractor(nn.Module):
    def __init__(self, in_channels=3, filters=64, sub_levels=4):
        super().__init__()
        self.extract_sublevels = SubTreeExtractor(in_channels, filters, sub_levels)
        self.sub_levels = sub_levels

    def forward(self, image_pyramid):
        levels = len(image_pyramid)
        sub_pyramids = [
            self.extract_sublevels(image_pyramid[i], min(levels - i, self.sub_levels))
            for i in range(levels)
        ]
        feature_pyramid = []
        for i in range(levels):
            features = sub_pyramids[i][0]
            for j in range(1, self.sub_levels):
                if j <= i:
                    features = torch.cat([features, sub_pyramids[i - j][j]], dim=1)
            feature_pyramid.append(features)
        return feature_pyramid


class FlowEstimator(nn.Module):
    def __init__(self, in_channels, num_convs, num_filters):
        super().__init__()
        convs = []
        for _ in range(num_convs):
            convs.append(nn.Conv2d(in_channels, num_filters, 3, padding=1))
            in_channels = num_filters
        self.convs = nn.ModuleList(convs)
        self.conv_bottleneck = nn.Conv2d(in_channels, num_filters // 2, 1)
        self.conv_out = nn.Conv2d(num_filters // 2, 2, 1)

    def forward(self, a, b):
        x = torch.cat([a, b], dim=1)
        for c in self.convs:
            x = _leaky(c(x))
        x = _leaky(self.conv_bottleneck(x))
        return self.conv_out(x)


class PyramidFlowEstimator(nn.Module):
    def __init__(self, feature_channels, flow_convs=(3, 3, 3, 3),
                 flow_filters=(32, 64, 128, 256)):
        super().__init__()
        specialized = len(flow_convs) - 1
        self.predictors = nn.ModuleList([
            FlowEstimator(2 * feature_channels[i], flow_convs[i], flow_filters[i])
            for i in range(specialized)
        ])
        self.shared_predictor = FlowEstimator(
            2 * feature_channels[specialized], flow_convs[-1], flow_filters[-1]
        )
        self.specialized = specialized

    def _predictor(self, i):
        return self.predictors[i] if i < self.specialized else self.shared_predictor

    def forward(self, pyramid_a, pyramid_b):
        levels = len(pyramid_a)
        v = self._predictor(levels - 1)(pyramid_a[-1], pyramid_b[-1])
        residuals = [v]
        for i in reversed(range(levels - 1)):
            h, w = pyramid_a[i].shape[2:]
            v = 2.0 * F.interpolate(v, size=(h, w), mode="bilinear",
                                    align_corners=False)
            warped = warp(pyramid_b[i], v)
            v_residual = self._predictor(i)(pyramid_a[i], warped)
            residuals.insert(0, v_residual)
            v = v_residual + v
        return residuals


class Fusion(nn.Module):
    def __init__(self, pyramid_channels, fusion_pyramid_levels=5,
                 specialized_levels=3, filters=64):
        super().__init__()
        self.levels = fusion_pyramid_levels
        up_convs, convs = [], []
        prev = pyramid_channels[-1]
        # built coarse-to-fine so in_channels chain correctly
        for i in reversed(range(fusion_pyramid_levels - 1)):
            m = (filters << i if i < specialized_levels
                 else filters << specialized_levels)
            up_convs.insert(0, nn.Conv2d(prev, m, 2))
            convs.insert(0, nn.ModuleList([
                nn.Conv2d(pyramid_channels[i] + m, m, 3, padding=1),
                nn.Conv2d(m, m, 3, padding=1),
            ]))
            prev = m
        self.up_convs = nn.ModuleList(up_convs)
        self.convs = nn.ModuleList(convs)
        self.output_conv = nn.Conv2d(prev, 3, 1)

    def forward(self, pyramid):
        net = pyramid[-1]
        for i in reversed(range(self.levels - 1)):
            h, w = pyramid[i].shape[2:]
            net = F.interpolate(net, size=(h, w), mode="nearest")
            net = F.pad(net, (0, 1, 0, 1))  # TF 'SAME' for even kernel
            net = self.up_convs[i](net)
            net = torch.cat([pyramid[i], net], dim=1)
            net = _leaky(self.convs[i][0](net))
            net = _leaky(self.convs[i][1](net))
        return self.output_conv(net)


def _feature_channels(filters, sub_levels, levels):
    out = []
    for i in range(levels):
        c = 0
        for j in range(sub_levels):
            if j <= i:
                c += filters << j
        out.append(c)
    return out


class Interpolator(nn.Module):
    def __init__(self, pyramid_levels=7, fusion_pyramid_levels=5,
                 specialized_levels=3, sub_levels=4, filters=64,
                 flow_convs=(3, 3, 3, 3), flow_filters=(32, 64, 128, 256)):
        super().__init__()
        self.pyramid_levels = pyramid_levels
        self.fusion_pyramid_levels = fusion_pyramid_levels
        feat_ch = _feature_channels(filters, sub_levels, pyramid_levels)
        self.extract = FeatureExtractor(3, filters, sub_levels)
        self.predict_flow = PyramidFlowEstimator(feat_ch, flow_convs, flow_filters)
        fusion_in = [2 * (3 + feat_ch[i]) + 4 for i in range(fusion_pyramid_levels)]
        self.fuse = Fusion(fusion_in, fusion_pyramid_levels,
                           specialized_levels, filters)

    def forward(self, x0, x1, dt):
        fuse_n = self.fusion_pyramid_levels
        dt = dt.reshape(-1, 1, 1, 1).float()
        pyr0 = build_image_pyramid(x0, self.pyramid_levels)
        pyr1 = build_image_pyramid(x1, self.pyramid_levels)
        feat0 = self.extract(pyr0)
        feat1 = self.extract(pyr1)
        fwd_residual = self.predict_flow(feat0, feat1)
        bwd_residual = self.predict_flow(feat1, feat0)
        fwd_flow = flow_pyramid_synthesis(fwd_residual)[:fuse_n]
        bwd_flow = flow_pyramid_synthesis(bwd_residual)[:fuse_n]
        bwd_flow = [f * dt for f in bwd_flow]
        fwd_flow = [f * (1.0 - dt) for f in fwd_flow]
        to_warp0 = [torch.cat([pyr0[i], feat0[i]], dim=1) for i in range(fuse_n)]
        to_warp1 = [torch.cat([pyr1[i], feat1[i]], dim=1) for i in range(fuse_n)]
        warped0 = [warp(to_warp0[i], bwd_flow[i]) for i in range(fuse_n)]
        warped1 = [warp(to_warp1[i], fwd_flow[i]) for i in range(fuse_n)]
        aligned = [
            torch.cat([warped0[i], warped1[i], bwd_flow[i], fwd_flow[i]], dim=1)
            for i in range(fuse_n)
        ]
        return self.fuse(aligned)
