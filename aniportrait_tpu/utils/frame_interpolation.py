"""Frame interpolation for the -acc fast path.

Parity target: reference ``src/utils/frame_interpolation.py`` — loads a
TorchScript FiLM net (``film_net_fp16.pt``) and recursively inserts
``inter_frames`` midpoints between each adjacent frame pair by binary
subdivision (frame_interpolation.py:22-69).

This build ships the same subdivision harness with pluggable interpolators:
  * ``film`` — FiLM-Net in flax (flow pyramid + fusion); weight conversion
    from the shipped TorchScript blob (planned; the blob is not in the
    snapshot).
  * ``linear`` — midpoint cross-fade fallback so the -acc pipeline shape is
    exercised end-to-end without the FiLM weights.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def linear_midpoint(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
    """Cross-fade midpoint; stand-in until FiLM weights are wired."""
    return 0.5 * frame1 + 0.5 * frame2


def init_frame_interpolation_model(backend: str = "linear") -> Callable:
    if backend == "linear":
        return linear_midpoint
    raise NotImplementedError(f"interpolation backend {backend!r} not available yet")


def batch_images_interpolation_tool(
    video: np.ndarray, model: Callable, inter_frames: int = 1
) -> np.ndarray:
    """video: (b, f, h, w, c) float.  Insert ``inter_frames`` frames between
    each adjacent pair by recursive binary subdivision (the reference's
    midpoint-splitting order, frame_interpolation.py:22-60)."""
    b, f = video.shape[:2]
    out_clips = []
    for bi in range(b):
        frames = [video[bi, i] for i in range(f)]
        result = [frames[0]]
        for i in range(f - 1):
            segment = _subdivide(frames[i], frames[i + 1], inter_frames, model)
            result.extend(segment[1:])
        out_clips.append(np.stack(result))
    return np.stack(out_clips)


def _subdivide(f1, f2, inter_frames: int, model: Callable):
    """Return [f1, ...inter..., f2] with inter_frames inserted midpoints."""
    seq = [f1, f2]
    remaining = inter_frames
    while remaining > 0:
        new_seq = [seq[0]]
        inserted = 0
        for i in range(len(seq) - 1):
            if inserted < remaining:
                new_seq.append(model(seq[i], seq[i + 1]))
                inserted += 1
            new_seq.append(seq[i + 1])
        seq = new_seq
        remaining -= inserted
    return seq
