"""Temporal context-window scheduler for long-form video denoising.

Reproduces the AnimateDiff-style "uniform" scheduler of the reference
(``src/pipelines/context.py:7-42``): overlapping frame-index windows with
power-of-2 strides, a per-denoise-step bit-reversal offset, and wraparound.

TPU twist: windows are precomputed here as **static numpy index arrays** per
denoise step, so the jitted denoise step sees fixed shapes — the window axis
then becomes a batch axis that can be sharded over devices.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np


def ordered_halving(val: int) -> float:
    """Bit-reversed fraction in [0, 1) (reference context.py:7-12)."""
    bin_str = f"{val:064b}"
    bin_flip = bin_str[::-1]
    as_int = int(bin_flip, 2)
    return as_int / (1 << 64)


def uniform(
    step: int = 0,
    num_steps: int | None = None,
    num_frames: int = 0,
    context_size: int | None = None,
    context_stride: int = 3,
    context_overlap: int = 4,
    closed_loop: bool = True,
):
    """Yield overlapping frame-index windows (generator, reference-compatible)."""
    if num_frames <= context_size:
        yield list(range(num_frames))
        return

    context_stride = min(
        context_stride, int(np.ceil(np.log2(num_frames / context_size))) + 1
    )

    for context_step in 1 << np.arange(context_stride):
        pad = int(round(num_frames * ordered_halving(step)))
        for j in range(
            int(ordered_halving(step) * context_step) + pad,
            num_frames + pad + (0 if closed_loop else -context_overlap),
            (context_size * context_step - context_overlap),
        ):
            yield [
                e % num_frames
                for e in range(j, j + context_size * context_step, context_step)
            ]


def get_context_scheduler(name: str) -> Callable:
    if name == "uniform":
        return uniform
    raise ValueError(f"Unknown context scheduler: {name}")


def uniform_context_windows(
    step: int,
    num_frames: int,
    context_size: int = 16,
    context_stride: int = 3,
    context_overlap: int = 4,
    closed_loop: bool = True,
) -> np.ndarray:
    """All windows for one denoise step as an ``(n_windows, context_size)``
    int32 array (static shape — short videos return a single window padded
    by repetition semantics of the reference: if ``num_frames <= context_size``
    the single window is ``range(num_frames)`` and the array is
    ``(1, num_frames)``)."""
    wins = list(
        uniform(
            step=step,
            num_frames=num_frames,
            context_size=context_size,
            context_stride=context_stride,
            context_overlap=context_overlap,
            closed_loop=closed_loop,
        )
    )
    return np.asarray(wins, dtype=np.int32)


def windows_for_all_steps(
    num_steps: int,
    num_frames: int,
    context_size: int = 16,
    context_stride: int = 3,
    context_overlap: int = 4,
) -> List[np.ndarray]:
    """Precompute the window table for every denoise step."""
    return [
        uniform_context_windows(
            s, num_frames, context_size, context_stride, context_overlap
        )
        for s in range(num_steps)
    ]
