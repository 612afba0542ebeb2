"""Host-side image preprocessing (numpy/cv2), matching the diffusers
``VaeImageProcessor`` / ``CLIPImageProcessor`` steps the reference pipelines
use (pipeline_pose2vid_long.py:380-383, 424-427)."""

from __future__ import annotations

import numpy as np

from aniportrait_tpu.models.clip_vision import CLIP_IMAGE_SIZE, CLIP_MEAN, CLIP_STD


def _resize(img: np.ndarray, width: int, height: int, bicubic: bool = True):
    import cv2

    if img.shape[1] == width and img.shape[0] == height:
        return img
    interp = cv2.INTER_CUBIC if bicubic else cv2.INTER_LINEAR
    return cv2.resize(img, (width, height), interpolation=interp)


def prepare_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> float32 (height, width, 3) in [-1, 1]
    (VaeImageProcessor: resize + scale to [0,1] + normalize)."""
    img = _resize(img, width, height)
    x = img.astype(np.float32) / 255.0
    return x * 2.0 - 1.0


def prepare_clip_image(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> CLIP-normalised float32 (224, 224, 3).

    The reference resizes the PIL image straight to 224x224 before the CLIP
    processor (pipeline_pose2vid_long.py:380-381), so no centre-crop."""
    img = _resize(img, CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE)
    x = img.astype(np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
