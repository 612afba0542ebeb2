"""aniportrait_tpu — a TPU-native (JAX/XLA/Pallas) framework for audio-driven
photorealistic portrait animation, with the capabilities of AniPortrait
(arXiv 2403.17694; reference implementation Zejun-Yang/AniPortrait).

Design notes (vs the PyTorch reference):
  * All image/video tensors are channels-last: images ``(b, h, w, c)``,
    videos ``(b, f, h, w, c)`` — the layout XLA:TPU prefers for convolutions.
  * The reference's monkey-patched mutable "attention banks"
    (reference ``src/models/mutual_self_attention.py``) are replaced by a
    functional two-phase design: the ReferenceNet forward *returns* a pytree
    of per-block normed hidden states, and the denoising UNet takes that
    pytree as a plain input.  Compute once, reuse across all denoise steps.
  * Everything on the hot path is jittable with static shapes; long-video
    context windows are precomputed index arrays.
"""

__version__ = "0.1.0"
