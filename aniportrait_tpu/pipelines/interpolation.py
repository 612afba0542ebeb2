"""Latent-space frame interpolation (linear / slerp).

Parity target: reference ``interpolate_latents``
(pipeline_pose2vid_long.py:293-336) + ``slerp``/``linear``
(src/pipelines/utils.py:14-29).  Inert by default in the reference
(``interpolation_factor=1`` and no caller sets the method); exposed here via
``Pose2VideoPipeline.__call__(..., interpolation_factor=, interp_method=)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear(v0, v1, t):
    return (1.0 - t) * v0 + t * v1


def slerp(v0, v1, t, dot_threshold: float = 0.9995):
    """Spherical interpolation over the FULL tensors (the reference norms
    the whole per-frame latent, utils.py:19-29)."""
    n0 = jnp.linalg.norm(v0)
    n1 = jnp.linalg.norm(v1)
    u0 = v0 / n0
    u1 = v1 / n1
    dot = jnp.sum(u0 * u1)
    omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    so = jnp.sin(omega)
    sl = (jnp.sin((1.0 - t) * omega) * v0 + jnp.sin(t * omega) * v1) / so
    return jnp.where(jnp.abs(dot) > dot_threshold, linear(v0, v1, t), sl)


def interpolate_latents(latents, interpolation_factor: int, method: str = "linear"):
    """latents: (b, f, h, w, 4) -> (b, (f-1)*k + 1, h, w, 4)."""
    if interpolation_factor < 2:
        return latents
    fn = slerp if method == "slerp" else linear
    b, f = latents.shape[:2]
    rates = [i / interpolation_factor for i in range(interpolation_factor)][1:]
    frames = []
    for i in range(f - 1):
        v0, v1 = latents[:, i], latents[:, i + 1]
        frames.append(v0)
        for t in rates:
            frames.append(fn(v0, v1, t))
    frames.append(latents[:, -1])
    return jnp.stack(frames, axis=1)
