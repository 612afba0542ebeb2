"""Quality metrics: PSNR / SSIM / LPIPS, for gating the TPU rebuild's
outputs against the PyTorch reference's outputs at matched seed + noise
(BASELINE.md north-star: >=3x frames/sec at matched LPIPS/PSNR).

PSNR and SSIM are dependency-free (numpy/scipy).  LPIPS is the AlexNet
variant (Zhang et al. 2018) implemented in JAX; the pretrained feature +
linear-calibration weights are not shipped in this image, so ``LPIPS``
loads from an ``.npz`` produced by :func:`convert_lpips_weights` from the
official ``lpips`` package checkpoint + torchvision AlexNet state dict.

Protocol (see scripts/quality_gate.py): generate with the SAME seed, SAME
noise, SAME conditioning on both stacks; compare frame-by-frame.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


# ----------------------------------------------------------------- PSNR/SSIM
def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB.  Inputs any shape, same range."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Mean SSIM over an image (H, W) or (H, W, C); standard 11x11
    gaussian window, K1=0.01, K2=0.03 (Wang et al. 2004)."""
    from scipy.ndimage import convolve1d

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return float(
            np.mean([ssim(a[..., c], b[..., c], data_range) for c in range(a.shape[-1])])
        )
    k = _gaussian_kernel()

    def filt(x):
        return convolve1d(convolve1d(x, k, axis=0, mode="reflect"), k, axis=1, mode="reflect")

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_aa
    sb = filt(b * b) - mu_bb
    sab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * sab + c2)
    den = (mu_aa + mu_bb + c1) * (sa + sb + c2)
    return float(np.mean(num / den))


# ---------------------------------------------------------------------- LPIPS
# AlexNet feature extractor config: (out_ch, kernel, stride, padding),
# with 3x3/2 max-pool after stages 0 and 1 (torchvision alexnet.features).
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# input normalisation of the LPIPS ScalingLayer (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_lpips_weights(
    lpips_ckpt_path: str, alexnet_state_path: str, out_path: str
) -> None:
    """Build the LPIPS .npz from the official checkpoints.

    * ``lpips_ckpt_path``: the lpips package's ``weights/v0.1/alex.pth``
      (keys ``lin{i}.model.1.weight`` — 1x1 conv calibration weights).
    * ``alexnet_state_path``: torchvision ``alexnet-owt-*.pth`` state dict
      (keys ``features.{0,3,6,8,10}.{weight,bias}``).
    """
    import torch

    lin = torch.load(lpips_ckpt_path, map_location="cpu", weights_only=True)
    alex = torch.load(alexnet_state_path, map_location="cpu", weights_only=True)
    out: Dict[str, np.ndarray] = {}
    for i, fidx in enumerate((0, 3, 6, 8, 10)):
        # OIHW -> HWIO for lax.conv
        out[f"conv{i}_w"] = (
            alex[f"features.{fidx}.weight"].numpy().transpose(2, 3, 1, 0)
        )
        out[f"conv{i}_b"] = alex[f"features.{fidx}.bias"].numpy()
        key = f"lin{i}.model.1.weight"
        if key not in lin:  # some releases nest under 'lins.'
            key = f"lins.{i}.model.1.weight"
        out[f"lin{i}"] = lin[key].numpy().reshape(-1)  # (C,)
    np.savez(out_path, **out)


class LPIPS:
    """JAX LPIPS(alex).  ``weights`` is the .npz from
    :func:`convert_lpips_weights` (or the same dict of arrays)."""

    def __init__(self, weights):
        import jax

        if isinstance(weights, (str, os.PathLike)):
            if not os.path.exists(weights):
                raise FileNotFoundError(
                    f"LPIPS weights not found at {weights!r}. Convert them "
                    "once with aniportrait_tpu.utils.quality."
                    "convert_lpips_weights(lpips_alex.pth, alexnet.pth, out.npz)"
                )
            weights = dict(np.load(weights))
        self.w = {k: np.asarray(v) for k, v in weights.items()}
        self._fn = jax.jit(self._distance)

    def _features(self, x):
        import jax
        import jax.numpy as jnp

        # x: (B, H, W, 3) in [-1, 1]
        x = (x - _SHIFT) / _SCALE
        feats = []
        for i in range(5):
            _, _, s, p = _ALEX_CONVS[i]
            x = jax.lax.conv_general_dilated(
                x,
                jnp.asarray(self.w[f"conv{i}_w"]),
                (s, s),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(self.w[f"conv{i}_b"])
            x = jax.nn.relu(x)
            feats.append(x)
            if i < 2:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def _distance(self, a, b):
        import jax.numpy as jnp

        fa, fb = self._features(a), self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2 * jnp.asarray(self.w[f"lin{i}"])
            total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
        return total

    def __call__(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a, b: (B, H, W, 3) float in [-1, 1] (or uint8, auto-scaled).
        Returns per-item LPIPS distances (B,)."""
        import jax.numpy as jnp

        def prep(x):
            x = np.asarray(x)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 127.5 - 1.0
            if x.ndim == 3:
                x = x[None]
            return jnp.asarray(x, jnp.float32)

        return np.asarray(self._fn(prep(a), prep(b)))


# ------------------------------------------------------------------- summary
def compare_videos(
    ours: np.ndarray,
    theirs: np.ndarray,
    lpips_weights: Optional[str] = None,
) -> Dict[str, float]:
    """Frame-wise metric summary between two (F, H, W, 3) uint8 clips."""
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    res = {
        "psnr": float(np.mean([psnr(a, b) for a, b in zip(ours, theirs)])),
        "ssim": float(np.mean([ssim(a, b) for a, b in zip(ours, theirs)])),
        "frames": int(ours.shape[0]),
    }
    if lpips_weights and os.path.exists(lpips_weights):
        metric = LPIPS(lpips_weights)
        res["lpips"] = float(np.mean(metric(ours, theirs)))
    return res
