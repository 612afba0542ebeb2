"""Pose-conditioned image/video generation pipelines (functional, jitted).

Parity targets:
  * ``Pose2ImagePipeline`` — reference src/pipelines/pipeline_pose2img.py
  * ``Pose2VideoPipeline`` (fixed, whole-clip) — pipeline_pose2vid.py
  * ``Pose2VideoPipeline`` (long, windowed) — pipeline_pose2vid_long.py

Structure of one generation (reference pipeline_pose2vid_long.py:339-584):
  1. CLIP-embed the reference image; CFG doubles the batch [uncond, cond]
     with a zero uncond embedding (:379-391).
  2. VAE-encode the reference image (latent mean x 0.18215, :424-431).
  3. Run the ReferenceNet ONCE at t=0 on the CFG-doubled ref latent to
     produce the attention banks (:475-485) — functional here: the banks are
     an explicit pytree output.
  4. Per denoise step, cut the frame axis into overlapping context windows
     (identical every step — the reference hardcodes scheduler step 0,
     :487-497), run PoseGuider + denoising UNet per window, scatter-add
     window predictions and counts, divide, CFG-combine, DDIM-step
     (:519-559).
  5. Decode latents frame-by-frame (:113-126).

TPU-first deviations (output-identical):
  * pose features are computed once for all frames and gathered per window
    (the PoseGuider is per-frame; the reference recomputes it per window per
    step — pipeline_pose2vid_long.py:531-536);
  * windows are batched through the UNet (``window_batch`` at a time) rather
    than sequential batch-1 calls;
  * the whole denoise loop is one jitted ``lax``-controlled program with
    static shapes per (L, H, W, steps).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from aniportrait_tpu.pipelines.context import uniform_context_windows
from aniportrait_tpu.schedulers import DDIMScheduler

VAE_SCALE = 0.18215


@dataclass
class PipelineModules:
    """Model defs + params for one generation stack."""

    vae: Any
    vae_params: Any
    clip: Any
    clip_params: Any
    reference_unet: Any
    reference_params: Any
    denoising_unet: Any
    denoising_params: Any
    pose_guider: Any
    pose_guider_variables: Any  # {'params':..., 'batch_stats':...}
    scheduler: DDIMScheduler


class Pose2VideoPipeline:
    """Callable pipeline; jit-compiles per (video_length, H, W, steps) bucket."""

    def __init__(
        self,
        modules: PipelineModules,
        dtype=jnp.float32,
        context_frames: int = 16,
        context_stride: int = 1,
        context_overlap: int = 4,
        window_batch: int = 4,
        mesh=None,
        encoder_cache_interval: int = 1,
        window_fusion: bool = False,
        fusion_motion: str = "auto",
        context_rotate: bool = False,
    ):
        """mesh: optional ``jax.sharding.Mesh`` with a 'data' axis — context
        windows of each denoise step are sharded across it (the reference
        runs windows sequentially on one GPU,
        pipeline_pose2vid_long.py:519); params are replicated.

        encoder_cache_interval: opt-in approximation (Faster Diffusion,
        arXiv 2312.09608): refresh the UNet's down+mid features every k-th
        denoise step and reuse them in between (the encoder's features vary
        slowly across adjacent steps).  1 = exact (default); 2-3 trades
        ~35-45%% of UNet compute for a small quality cost — gate with
        scripts/quality_gate.py before production use.

        window_fusion: opt-in overlap-aware long-clip mode.  The exact
        windowed path (the reference's, pipeline_pose2vid_long.py:519-548)
        runs the UNet once per overlapping 16-frame window and averages
        the overlapping noise predictions — 1.33x UNet slots per frame at
        the default 16/4 windowing.  Everything in the UNet except the
        motion modules is per-frame (identical across windows), so the
        fused mode runs ONE whole-clip UNet pass where each motion module
        windows its temporal attention internally and averages overlap
        hidden states (models/motion_module.py) — per-frame work drops
        1.33x -> 1x.  Approximation: overlap averaging happens at each
        motion module instead of once at the UNet output; measured
        quality vs the exact path in BASELINE.md (scripts/
        quality_speed_gate.py).

        fusion_motion: how the fused mode windows its motion modules.
          'auto' (default) — whole-clip temporal attention when
            L <= motion PE max (32): the reference's own fixed-length
            pipeline semantics (pipeline_pose2vid.py; its stage-2
            validation runs 16-24 frames whole-clip); else the fewest
            windows of length <= 32 with overlap >= context_overlap
            (context.wide_motion_windows, ~1.08x slots at 48 frames).
          'context' — the exact path's context window table (16/4), the
            most conservative fusion (only the averaging point moves).

        context_rotate: OPT-IN (default off): rotate the window table per
        denoise step by the van-der-Corput phase (context.py:7-12) so
        window seams land on different frames each step.  NOT reference
        behavior: the reference's scheduler supports rotation but both its
        call sites hardcode step 0 (pipeline_pose2vid_long.py:488,500), so
        its window table is identical every denoise step — the exact
        default path here matches that.  Rotation is a quality experiment
        on top; quality-gate it against the step-0 exact path before
        production use.  Auto-disabled (fixed step-0 table) in
        window-fusion mode (motion modules need ONE static table) and when
        the encoder cache is active (cached per-window features must refer
        to the same frames across steps)."""
        self.m = modules
        self.dtype = dtype
        self.context_frames = context_frames
        self.context_stride = context_stride
        self.context_overlap = context_overlap
        self.window_batch = window_batch
        self.mesh = mesh
        self.encoder_cache_interval = int(encoder_cache_interval)
        self.window_fusion = bool(window_fusion)
        self.fusion_motion = fusion_motion
        self.context_rotate = bool(context_rotate)
        self._mesh2 = None
        if mesh is not None:
            from jax.sharding import Mesh

            from aniportrait_tpu.parallel.mesh import replicate

            n_dev = mesh.devices.size
            # ONE canonical mesh for every inference program of this
            # pipeline: a 2-D CFG-pair x frame/window view of the same
            # devices.  Shardy requires a single mesh per program (mixing
            # the caller's 1-D 'data' mesh with a 2-D view raises at
            # lowering once the partitioned Pallas kernels are present);
            # the exact windowed path shards window rows over BOTH axes
            # flattened — identical device assignment to the old P('data').
            cfg_ways = 2 if n_dev % 2 == 0 else 1
            self._mesh2 = Mesh(
                mesh.devices.reshape(cfg_ways, n_dev // cfg_ways),
                ("cfg", "frames"),
            )
            for attr in ("vae_params", "clip_params", "reference_params",
                         "denoising_params", "pose_guider_variables"):
                setattr(
                    self.m, attr,
                    replicate(getattr(self.m, attr), self._mesh2),
                )
            # CFG doubles the row axis; keep 2*window_batch divisible
            if (2 * self.window_batch) % n_dev:
                self.window_batch = max(n_dev // 2, 1) * max(
                    1, (2 * self.window_batch) // n_dev
                )
        self._compiled: Dict[Any, Any] = {}
        from aniportrait_tpu.utils.profiling import PhaseTimer

        self.timer = PhaseTimer()
        # params are passed as jit ARGUMENTS (not Python closures): closures
        # embed the weights as constants in the HLO, which bloats the
        # serialized module (and this environment's remote-compile service
        # rejects oversized requests)
        self._encode_ref_jit = jax.jit(self._encode_reference)
        self._pose_features_jit = jax.jit(self._pose_features)
        self._decode_chunk_jit = None

    # ------------------------------------------------------------- helpers
    def _encode_reference(self, params3, ref_image_u8, clip_image_u8):
        """params3: (clip_params, vae_params, reference_params).
        ref_image_u8: (1, H, W, 3) uint8; clip_image_u8: (1,224,224,3) uint8
        (resized on host; normalised here on device).  Returns
        (image_embeds_cfg (2,1,768), ref_latents, banks with batch 2)."""
        from aniportrait_tpu.models.clip_vision import CLIP_MEAN, CLIP_STD

        clip_params, vae_params, reference_params = params3
        m = self.m
        ref_image = ref_image_u8.astype(self.dtype) / 127.5 - 1.0
        clip_image = (
            (clip_image_u8.astype(jnp.float32) / 255.0 - jnp.asarray(CLIP_MEAN))
            / jnp.asarray(CLIP_STD)
        ).astype(self.dtype)
        embeds = m.clip.apply({"params": clip_params}, clip_image)  # (1, 768)
        ctx = embeds[:, None, :]  # (1, 1, 768)
        ctx_cfg = jnp.concatenate([jnp.zeros_like(ctx), ctx], axis=0)  # (2,1,768)

        mean, _ = m.vae.apply(
            {"params": vae_params}, ref_image.astype(self.dtype), method=m.vae.encode
        )
        ref_latents = mean * VAE_SCALE  # (1, h, w, 4)

        ref_in = jnp.concatenate([ref_latents] * 2, axis=0)[:, None]  # (2,1,h,w,4)
        t0 = jnp.zeros((2,), jnp.int32)
        _, banks = m.reference_unet.apply(
            {"params": reference_params},
            ref_in,
            t0,
            ctx_cfg,
            capture_banks=True,
        )
        return ctx_cfg, ref_latents, banks

    def stage_inputs(self, ref_image, pose_images, width, height, device=True):
        """Host-side prep (+ optional device upload) of the pipeline inputs:
        returns (ref (1,H,W,3) u8, clip_img (1,s,s,3) u8, poses (1,L,H,W,3)
        u8).  With ``device=True`` the arrays are placed on device so a
        subsequent ``__call__((staged), None, ...)`` spends no time in
        host->device transfer — through a remote-chip tunnel the upload can
        otherwise dominate the clip time."""
        from aniportrait_tpu.utils.image import _resize

        ref = _resize(ref_image, width, height)[None]
        clip_size = self.m.clip.image_size
        clip_img = _resize(ref_image, clip_size, clip_size)[None]
        poses = np.stack(
            [_resize(p, width, height) for p in pose_images], axis=0
        )[None]
        if device:
            ref, clip_img, poses = jax.device_put((ref, clip_img, poses))
        return ref, clip_img, poses

    def _pose_features(self, pg_variables, pose_video_u8):
        """pose_video_u8: (1, L, H, W, 3) uint8 -> list of 5 features.
        Normalisation happens on device (uint8 host->device transfer is 4x
        cheaper than f32 — significant through this chip's tunnel)."""
        pose = pose_video_u8.astype(self.dtype) / 127.5 - 1.0
        return self.m.pose_guider.apply(pg_variables, pose)

    def _build_sampler(self, video_length, hlat, wlat, steps, guidance_scale, windowed):
        """Return a jitted function running the full denoise loop."""
        m = self.m
        sched = m.scheduler
        timesteps = jnp.asarray(sched.timesteps(steps))
        do_cfg = guidance_scale > 1.0

        if windowed and video_length > self.context_frames:
            windows = uniform_context_windows(
                0,
                video_length,
                self.context_frames,
                self.context_stride,
                self.context_overlap,
            )
        else:
            windows = np.arange(video_length, dtype=np.int32)[None]
        windows_np = np.asarray(windows)
        windows = jnp.asarray(windows)  # (n_win, win_len)
        n_win, win_len = windows.shape
        # window-fused mode: ONE whole-clip UNet pass per step; the motion
        # modules window internally (see __init__ docstring).  Composes with
        # the device mesh: the whole-clip pass shards over CFG-pair x
        # frame-block rows (see the mesh2 derivation below).
        fused = (
            self.window_fusion
            and windowed
            and n_win > 1
        )
        # STATIC (numpy) window table for the motion modules: contiguous
        # windows then lower to slices + fused pad-adds instead of
        # gather/scatter-add HBM passes (motion_module.py).  Fused mode is
        # free to re-window WIDER than the exact path's 16/4 (it is already
        # an overlap-averaging approximation, quality-gated in BASELINE.md):
        #   * L <= motion PE max (32): NO windows — whole-clip temporal
        #     attention, which is the reference's own fixed-length pipeline
        #     semantics (pipeline_pose2vid.py, its stage-2 validation runs
        #     16-24 frames whole-clip) — zero window overhead;
        #   * L > 32: fewest windows of length <= 32 with overlap >= 4
        #     (wide_motion_windows) — 1.08x frame-slots at 48 frames
        #     instead of the 16/4 table's 1.33x.
        motion_windows = None
        if fused:
            pe_max = getattr(m.denoising_unet, "motion_pe_max_len", 32)
            if self.fusion_motion == "context":
                motion_windows = windows_np
            elif video_length > pe_max:
                from aniportrait_tpu.pipelines.context import (
                    wide_motion_windows,
                )

                motion_windows = wide_motion_windows(
                    video_length, pe_max, max(self.context_overlap, 1)
                )
        # whole-clip case (L <= context window, e.g. the 16-frame driver
        # config) — one window covering frames 0..L-1 — or window-fused
        # mode: both run ONE whole-clip UNet call per step and skip the
        # gather/scatter-add/counter machinery entirely (the iota gather and
        # scatter-add are pure copies XLA does not always elide)
        single = fused or (n_win == 1 and int(win_len) == int(video_length))

        # mesh composition for the whole-clip pass: everything in the UNet
        # except the motion modules is per-frame, so the natural shard is
        # CFG-pair x frame blocks — a 2-D view of the SAME devices.  The
        # (b, f, ...) -> (b*f, ...) frame folds inside the UNet merge
        # cfg-major/frames-minor, which is exactly the 2-D mesh's device
        # order, so GSPMD propagates the sharding through the folds without
        # resharding; only the motion modules' temporal attention (frames
        # axis) and window-overlap means trigger collectives.  This is what
        # lets window fusion (1.0-1.08x frame-slots) COMPOSE with the 8-chip
        # mesh instead of excluding it (the exact windowed path shards
        # window rows instead, 1.33x slots).
        if self._mesh2 is not None and single:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh2 = self._mesh2
            cfg_ok = do_cfg and mesh2.shape["cfg"] == 2
            _s_rows = NamedSharding(
                mesh2,
                P("cfg", "frames") if cfg_ok else P(None, ("cfg", "frames")),
            )
            _s_lat = NamedSharding(
                mesh2,
                P(None, "frames") if cfg_ok else P(None, ("cfg", "frames")),
            )
            _s_cfg = NamedSharding(mesh2, P("cfg") if cfg_ok else P())

            def shard_rows(x):
                return jax.lax.with_sharding_constraint(x, _s_rows)

            def shard_lat(x):
                return jax.lax.with_sharding_constraint(x, _s_lat)

            def shard_cfg_tree(tree):
                return jax.tree.map(
                    lambda v: jax.lax.with_sharding_constraint(v, _s_cfg), tree
                )
        else:
            shard_rows = shard_lat = lambda x: x
            shard_cfg_tree = lambda tree: tree

        # fused mode runs ONE whole-clip UNet call per step: banks/context
        # tile to the clip's (2 if CFG else 1) rows, not window-batch rows
        wb = (
            1
            if single
            else self.window_batch
            if self.mesh is not None
            else min(self.window_batch, n_win)
        )
        # pad window count to a multiple of wb; padded windows are masked out
        n_pad = (-n_win) % wb
        if n_pad:
            reps = 1 + (n_pad + n_win - 1) // n_win
            windows = jnp.tile(windows, (reps, 1))[: n_win + n_pad]
        win_valid = jnp.arange(windows.shape[0]) < n_win
        windows_b = windows.reshape(-1, wb, win_len)
        valid_b = win_valid.reshape(-1, wb)

        def tile_cfg(ctx_cfg, banks, n_rows):
            """Tile context/banks per window-batch row — constant across
            steps and windows, so hoisted OUT of the scan (previously this
            re-materialised ~0.4 GB of bank copies every denoise step)."""
            half = n_rows // 2 if do_cfg else n_rows
            ctx = jnp.concatenate(
                [
                    jnp.repeat(ctx_cfg[:1], half, axis=0),
                    jnp.repeat(ctx_cfg[1:], half, axis=0),
                ],
                axis=0,
            ) if do_cfg else jnp.repeat(ctx_cfg[1:], n_rows, axis=0)
            banks_t = jax.tree.map(
                lambda v: jnp.concatenate(
                    [jnp.repeat(v[:1], half, axis=0), jnp.repeat(v[1:], half, axis=0)],
                    axis=0,
                )
                if do_cfg
                else jnp.repeat(v[1:], n_rows, axis=0),
                banks,
            )
            return ctx, banks_t

        k_cache = max(1, self.encoder_cache_interval)

        # OPT-IN per-step window rotation (NOT reference behavior: the
        # reference hardcodes step 0 at pipeline_pose2vid_long.py:488,500,
        # so its table never rotates — see __init__ docstring).
        # Only the exact multi-window path can rotate; fusion needs one
        # static table and the encoder cache needs stable frame<->slot maps.
        rotate = self.context_rotate and not single and k_cache <= 1
        if rotate:
            from aniportrait_tpu.pipelines.context import windows_for_all_steps

            tabs = windows_for_all_steps(
                steps, video_length, self.context_frames,
                self.context_stride, self.context_overlap,
            )
            max_win = max(t.shape[0] for t in tabs)
            pad_to = max_win + ((-max_win) % wb)

            def _pad_tab(t):
                nw = t.shape[0]
                reps = 1 + (pad_to - 1) // nw
                return (
                    np.tile(t, (reps, 1))[:pad_to],
                    np.arange(pad_to) < nw,
                )

            padded = [_pad_tab(t) for t in tabs]
            windows_all_b = jnp.asarray(
                np.stack([p[0] for p in padded])
            ).reshape(steps, -1, wb, win_len)
            valid_all_b = jnp.asarray(
                np.stack([p[1] for p in padded])
            ).reshape(steps, -1, wb)
        else:
            windows_all_b = valid_all_b = None

        def _shard_win(x):
            # window rows over BOTH axes of the canonical 2-D mesh
            # flattened — the same device assignment as the old 1-D
            # P('data'), but on the single program-wide mesh
            if self._mesh2 is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self._mesh2, P(("cfg", "frames")))
                )
            return x

        def _shard_win_all(x):
            """Shard a stacked (n_batches, rows, ...) window table on rows."""
            if self._mesh2 is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self._mesh2, P(None, ("cfg", "frames")))
                )
            return x

        def _window_lat(latents, win):
            """Gather + CFG-double the per-window latents (changes per step)."""
            lat = latents[0][win]  # (wb, win_len, h, w, 4)
            lat = jnp.concatenate([lat] * 2, axis=0) if do_cfg else lat
            return _shard_win(lat)

        def _window_pose(pose_fea, win):
            """Gather + CFG-double the per-window pose features.  Constant
            across denoise steps — call once per window table and feed the
            result through the scan as xs (the previous per-step gather +
            CFG-double re-materialised the whole pose pyramid every step:
            ~300 MB of HBM copies/step at 24 frames)."""
            return [
                _shard_win(
                    jnp.concatenate([pf[0][win]] * 2, axis=0)
                    if do_cfg
                    else pf[0][win]
                )
                for pf in pose_fea
            ]

        def _unet_apply(den_params, lat, t, ctx, banks_t, pose_w, **kw):
            b = lat.shape[0]
            # static CFG structure: uncond rows are the first half —
            # dispatched as separate self-only / concat attention calls
            # instead of a traced mask (saves the dual-computation)
            out, _ = m.denoising_unet.apply(
                {"params": den_params},
                lat.astype(self.dtype),
                jnp.full((b,), t, jnp.int32),
                ctx,
                pose_cond_fea=pose_w,
                ref_banks=banks_t,
                drop_ref=None,
                drop_mode="first_half" if do_cfg else "none",
                motion_windows=motion_windows,
                **kw,
            )
            return out

        def unet_on_windows(den_params, latents, t, ctx, banks_t, pose_w,
                            win, valid, refresh=None, enc_cache=None):
            """win: (wb, win_len) frame indices; returns (pred, new_cache).
            ctx/banks_t are already tiled to the window-batch rows; pose_w is
            the pre-gathered CFG-doubled pose pyramid for this window batch.
            With the encoder cache active, down+mid features are recomputed
            only when ``refresh`` is True, else ``enc_cache`` is reused."""
            lat = _window_lat(latents, win)
            if k_cache <= 1:
                pred = _unet_apply(den_params, lat, t, ctx, banks_t, pose_w)
                return pred, None
            enc = jax.lax.cond(
                refresh,
                lambda: _unet_apply(
                    den_params, lat, t, ctx, banks_t, pose_w, mode="encode"
                ),
                lambda: enc_cache,
            )
            pred = _unet_apply(
                den_params, lat, t, ctx, banks_t, pose_w,
                mode="decode", enc_features=enc,
            )
            return pred, enc  # (b, win_len, h, w, 4), cache pytree

        def _one_step_single(den_params, latents, t, step_i, ctx_t, banks_t,
                             pose_w, cache):
            """Whole-clip denoise step: latents (1, L, h, w, 4) go through
            the UNet directly (CFG-doubled), no window indexing.  pose_w is
            the CFG-doubled pose pyramid, hoisted OUT of the step (constant
            across steps; doubling it per step was ~150 MB of HBM copies
            each iteration).  Under a mesh, rows shard as CFG x frame
            blocks (see mesh2 above)."""
            lat = shard_rows(
                jnp.concatenate([latents] * 2, axis=0) if do_cfg else latents
            )
            if k_cache > 1:
                refresh = (step_i % k_cache) == 0
                enc = jax.lax.cond(
                    refresh,
                    lambda: _unet_apply(
                        den_params, lat, t, ctx_t, banks_t, pose_w, mode="encode"
                    ),
                    lambda: cache,
                )
                pred = _unet_apply(
                    den_params, lat, t, ctx_t, banks_t, pose_w,
                    mode="decode", enc_features=enc,
                )
            else:
                enc = None
                pred = _unet_apply(den_params, lat, t, ctx_t, banks_t, pose_w)
            pred = pred.astype(jnp.float32)
            if do_cfg:
                pu, pc = jnp.split(pred, 2, axis=0)
                pred = pu + guidance_scale * (pc - pu)
            new_latents = sched.step(pred, t, latents, num_inference_steps=steps)
            return shard_lat(new_latents), enc

        def sample_impl(den_params, latents, ctx_cfg, banks, pose_fea):
            n_rows = (2 if do_cfg else 1) * wb
            ctx_t, banks_t = tile_cfg(ctx_cfg, banks, n_rows)

            if single:
                # co-locate each CFG row's banks/context with its device
                # group; latents carry frame-block sharding through the scan
                ctx_t = shard_cfg_tree(ctx_t)
                banks_t = shard_cfg_tree(banks_t)
                latents = shard_lat(latents)
                # CFG-double the pose pyramid ONCE (constant across steps)
                pose_w = [
                    shard_rows(
                        jnp.concatenate([pf] * 2, axis=0) if do_cfg else pf
                    )
                    for pf in pose_fea
                ]
                if k_cache > 1:
                    lat0 = (
                        jnp.concatenate([latents] * 2, axis=0)
                        if do_cfg
                        else latents
                    )
                    enc_shapes = jax.eval_shape(
                        lambda p, l: _unet_apply(
                            p, l, timesteps[0], ctx_t, banks_t, pose_w,
                            mode="encode",
                        ),
                        den_params, lat0,
                    )
                    cache0 = jax.tree.map(
                        lambda s: jnp.zeros(s.shape, s.dtype), enc_shapes
                    )
                else:
                    cache0 = None

                def step1(carry, t_and_i):
                    t, i = t_and_i
                    latents, cache = carry
                    new_lat, new_cache = _one_step_single(
                        den_params, latents, t, i, ctx_t, banks_t, pose_w,
                        cache,
                    )
                    return (new_lat, new_cache), None

                (latents, _), _ = jax.lax.scan(
                    step1, (latents, cache0),
                    (timesteps, jnp.arange(len(timesteps))),
                )
                return latents

            # pre-gather + CFG-double the pose pyramid for EVERY window batch
            # (constant across denoise steps when the table does not rotate);
            # fed through the window scan as xs
            if rotate:
                pose_b = None
            else:
                pose_b = [
                    _shard_win_all(
                        jnp.concatenate([pf[0][windows_b]] * 2, axis=1)
                        if do_cfg
                        else pf[0][windows_b]
                    )
                    for pf in pose_fea
                ]

            if k_cache > 1:
                # per-window-batch encoder cache, zeros until first refresh
                lat0 = _window_lat(latents, windows_b[0])
                pose_w0 = (
                    [p[0] for p in pose_b]
                    if pose_b is not None
                    else _window_pose(pose_fea, windows_b[0])
                )
                enc_shapes = jax.eval_shape(
                    lambda p, l: _unet_apply(
                        p, l, timesteps[0], ctx_t, banks_t, pose_w0,
                        mode="encode",
                    ),
                    den_params, lat0,
                )
                cache0 = jax.tree.map(
                    lambda s: jnp.zeros(
                        (windows_b.shape[0],) + s.shape, s.dtype
                    ),
                    enc_shapes,
                )
            else:
                cache0 = None

            def step(carry, xs_):
                if rotate:
                    t, i, wt, vt = xs_
                else:
                    (t, i), wt, vt = xs_, None, None
                latents, cache = carry
                new_lat, new_cache = _one_step(
                    den_params, latents, t, i, ctx_t, banks_t, pose_fea,
                    pose_b, cache, wt, vt,
                )
                return (new_lat, new_cache), None

            xs_scan = (
                (timesteps, jnp.arange(len(timesteps)), windows_all_b,
                 valid_all_b)
                if rotate
                else (timesteps, jnp.arange(len(timesteps)))
            )
            (latents, _), _ = jax.lax.scan(step, (latents, cache0), xs_scan)
            return latents

        def _one_step(den_params, latents, t, step_i, ctx_t, banks_t, pose_fea,
                      pose_b, cache, win_tab=None, val_tab=None):
            wtab = windows_b if win_tab is None else win_tab
            vtab = valid_b if val_tab is None else val_tab
            acc_shape = (2 if do_cfg else 1, video_length, hlat, wlat, 4)
            noise_pred0 = jnp.zeros(acc_shape, jnp.float32)
            counter0 = jnp.zeros((1, video_length, 1, 1, 1), jnp.float32)
            refresh = (step_i % k_cache) == 0

            def win_body(accs, xs):
                noise_pred, counter = accs
                cache_slice = pose_w = None
                if pose_b is None:  # rotating table: gather per step
                    if k_cache > 1:
                        win, valid, cache_slice = xs
                    else:
                        win, valid = xs
                    pose_w = _window_pose(pose_fea, win)
                elif k_cache > 1:
                    win, valid, pose_w, cache_slice = xs
                else:
                    win, valid, pose_w = xs
                pred, new_cache = unet_on_windows(
                    den_params, latents, t, ctx_t, banks_t, pose_w, win,
                    valid, refresh=refresh, enc_cache=cache_slice,
                )
                pred = pred.astype(jnp.float32)
                vmask = valid.astype(jnp.float32)
                if do_cfg:
                    pu, pc = jnp.split(pred, 2, axis=0)
                else:
                    pu, pc = pred, None
                for k in range(pu.shape[0]):
                    w = vmask[k]
                    noise_pred = noise_pred.at[0, win[k]].add(pu[k] * w)
                    if do_cfg:
                        noise_pred = noise_pred.at[1, win[k]].add(pc[k] * w)
                    counter = counter.at[0, win[k]].add(w)
                return (noise_pred, counter), new_cache

            if pose_b is None:
                xs = (wtab, vtab, cache) if k_cache > 1 else (wtab, vtab)
            elif k_cache > 1:
                xs = (wtab, vtab, pose_b, cache)
            else:
                xs = (wtab, vtab, pose_b)
            (noise_pred, counter), new_cache = jax.lax.scan(
                win_body, (noise_pred0, counter0), xs
            )
            noise_pred = noise_pred / counter
            if do_cfg:
                pred = noise_pred[0:1] + guidance_scale * (
                    noise_pred[1:2] - noise_pred[0:1]
                )
            else:
                pred = noise_pred[0:1]
            new_latents = sched.step(pred, t, latents, num_inference_steps=steps)
            return new_latents, new_cache

        return jax.jit(sample_impl)

    def run_cases(self, cases, width, height, **kw):
        """Run a sequence of clips with host<->device IO overlapped against
        compute (VERDICT r4 item 8): case ``i+1``'s pose/ref upload and
        case ``i-1``'s uint8 video download ride IO threads while case
        ``i`` denoises.  Through this chip's tunnel the uploads+download
        are ~13% of a clip (e2e 1.604 vs compute 1.856 f/s on the driver
        config); pipelined across a multi-case CLI run only the FIRST
        upload and LAST download remain exposed.  (The reference's loops
        are fully synchronous, scripts/pose2vid.py:136-207.)

        Args:
          cases: iterable of dicts with ``ref_image`` (H,W,3 u8),
            ``pose_images`` (list of u8), optional ``ref_pose_image``,
            ``key`` (yielded back, default the index) and ``kw``
            (per-case overrides, e.g. a different ``video_length``).
          kw: forwarded to ``__call__`` (video_length, steps, ...).
        Yields ``(key, video)`` with video (L,H,W,3) float32 in [0,1], in
        case order.
        """
        import concurrent.futures as cf

        cases = list(cases)
        if not cases:
            return
        ex = cf.ThreadPoolExecutor(max_workers=2)
        try:
            stage = lambda c: self.stage_inputs(
                c["ref_image"], c["pose_images"], width, height, device=True
            )
            fetch = lambda v: np.asarray(v).astype(np.float32) / 255.0
            staged_f = ex.submit(stage, cases[0])
            fetch_f, prev_key = None, None
            for i, c in enumerate(cases):
                staged = staged_f.result()
                if i + 1 < len(cases):
                    staged_f = ex.submit(stage, cases[i + 1])
                video_dev = self(
                    staged, None, c.get("ref_pose_image"), width, height,
                    return_device=True, **{**kw, **c.get("kw", {})},
                )
                if fetch_f is not None:
                    yield prev_key, fetch_f.result()
                fetch_f = ex.submit(fetch, video_dev)
                prev_key = c.get("key", i)
            yield prev_key, fetch_f.result()
        finally:
            ex.shutdown(wait=False)

    def _mesh_ctx(self):
        """Context manager making the pipeline's canonical 2-D mesh the
        ambient mesh during tracing/lowering — programs must not mix the
        caller's 1-D mesh view with the internal cfg x frames view."""
        import contextlib

        return self._mesh2 if self._mesh2 is not None else (
            contextlib.nullcontext()
        )

    def _decode(self, latents, decode_chunk: int = 8, to_host: bool = False):
        """latents (1, L, h, w, 4) -> video (L, H, W, 3) uint8; on device
        by default, or streamed to HOST with ``to_host=True`` — each
        chunk's device->host fetch rides an IO thread while the next chunk
        decodes, hiding most of the download behind decode compute (the
        reference fetches the whole clip after a sequential per-frame
        decode loop, pipeline_pose2vid_long.py:113-126)."""
        m = self.m
        z = latents[0] / VAE_SCALE  # (L, h, w, 4)
        L = z.shape[0]
        decode_chunk = min(decode_chunk, L)
        pad = (-L) % decode_chunk
        if pad:
            z = jnp.concatenate([z, z[:pad]], axis=0)
        chunks = z.reshape(-1, decode_chunk, *z.shape[1:])

        if self._decode_chunk_jit is None:
            def dec(vae_params, chunk):
                img = m.vae.apply(
                    {"params": vae_params},
                    chunk.astype(self.dtype),
                    method=m.vae.decode,
                )
                img = (img.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
                # stage as uint8: 4x cheaper device->host transfer, same
                # precision as the video files written downstream
                return jnp.round(img * 255.0).astype(jnp.uint8)

            self._decode_chunk_jit = jax.jit(dec)

        if to_host:
            import concurrent.futures as cf

            ex = cf.ThreadPoolExecutor(max_workers=1)
            try:
                futs = [
                    ex.submit(np.asarray, self._decode_chunk_jit(m.vae_params, c))
                    for c in chunks
                ]
                out = np.concatenate([f.result() for f in futs], axis=0)
            finally:
                ex.shutdown(wait=False)
            return out[:L]  # uint8 on HOST

        out = jnp.concatenate(
            [self._decode_chunk_jit(m.vae_params, c) for c in chunks], axis=0
        )
        return out[:L]  # uint8 on device

    def abstract_sampler(self, width, height, video_length,
                         num_inference_steps, guidance_scale: float = 3.5,
                         windowed: bool = True):
        """(jitted sampler, ShapeDtypeStruct args) for one bucket — the
        shape-level view of the denoise program, usable for ``eval_shape``
        (compile-free trace checks) or ``lower().compile()`` (the HBM
        accounting in :meth:`memory_report`)."""
        m = self.m
        sds = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        u8 = lambda shape: jax.ShapeDtypeStruct(shape, jnp.uint8)
        clip_size = m.clip.image_size
        params3 = jax.tree.map(
            sds, (m.clip_params, m.vae_params, m.reference_params)
        )
        ctx_s, _, banks_s = jax.eval_shape(
            self._encode_reference, params3,
            u8((1, height, width, 3)), u8((1, clip_size, clip_size, 3)),
        )
        pose_s = jax.eval_shape(
            self._pose_features, jax.tree.map(sds, m.pose_guider_variables),
            u8((1, video_length, height, width, 3)),
        )
        hlat, wlat = height // 8, width // 8
        sampler = self._build_sampler(
            video_length, hlat, wlat, num_inference_steps, guidance_scale,
            windowed,
        )
        lat_s = jax.ShapeDtypeStruct(
            (1, video_length, hlat, wlat, 4), jnp.float32
        )
        den_s = jax.tree.map(sds, m.denoising_params)
        return sampler, (den_s, lat_s, ctx_s, banks_s, pose_s)

    def memory_report(self, width, height, video_length, num_inference_steps,
                      guidance_scale: float = 3.5, windowed: bool = True):
        """HBM accounting for one sampler bucket WITHOUT running it:
        AOT-lower + compile the denoise sampler at the given shapes and
        return XLA's compiled memory stats (argument/output/temp bytes).
        ``peak ~= arguments + outputs + temps`` bounds the HBM the denoise
        program needs; weights are inside ``arguments``.  (The axon
        backend exposes no runtime memory_stats API — this is the
        compile-time accounting the v5e-16GB fit claims rest on.)"""
        sampler, args = self.abstract_sampler(
            width, height, video_length, num_inference_steps,
            guidance_scale, windowed,
        )
        compiled = sampler.lower(*args).compile()
        ma = compiled.memory_analysis()
        gib = 1 / (1 << 30)
        return {
            "config": {
                "width": width, "height": height, "frames": video_length,
                "steps": num_inference_steps, "cfg": guidance_scale,
                "windowed": windowed, "fused": self.window_fusion,
                "devices": 1 if self.mesh is None else int(self.mesh.devices.size),
            },
            "argument_gib": ma.argument_size_in_bytes * gib,
            "output_gib": ma.output_size_in_bytes * gib,
            "temp_gib": ma.temp_size_in_bytes * gib,
            "alias_gib": ma.alias_size_in_bytes * gib,
            "peak_bound_gib": (
                ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes
            ) * gib,
            "code_mib": ma.generated_code_size_in_bytes / (1 << 20),
        }

    # ---------------------------------------------------------------- call
    def __call__(
        self,
        ref_image: np.ndarray,
        pose_images: List[np.ndarray],
        ref_pose_image: Optional[np.ndarray],
        width: int,
        height: int,
        video_length: int,
        num_inference_steps: int = 25,
        guidance_scale: float = 3.5,
        seed: int = 42,
        windowed: bool = True,
        decode_chunk: int = 8,
        interpolation_factor: int = 1,
        interp_method: str = "linear",
        return_device: bool = False,
    ) -> np.ndarray:
        """All images are uint8 RGB numpy arrays (H, W, 3) — or the staged
        device tuple from :meth:`stage_inputs` passed as ``ref_image`` with
        ``pose_images=None`` (skips host-side prep + upload; use when inputs
        are reused or pre-staged asynchronously).
        Returns video (L, H, W, 3) float32 in [0, 1]."""
        poses_f = None
        if pose_images is None:
            ref, clip_img, poses = ref_image  # staged device arrays
        else:
            ref, clip_img, poses = self.stage_inputs(
                ref_image, pose_images, width, height, device=False
            )
            # the pose video is the big upload (L x H x W x 3 u8); start it
            # on an IO thread so it rides the tunnel while the reference
            # encodes (the reference uploads everything serially)
            import concurrent.futures as cf

            _ex = cf.ThreadPoolExecutor(max_workers=1)
            poses_f = _ex.submit(jax.device_put, poses)
            _ex.shutdown(wait=False)

        m = self.m
        with self.timer.phase("encode_reference"), self._mesh_ctx():
            ctx_cfg, _, banks = jax.block_until_ready(
                self._encode_ref_jit(
                    (m.clip_params, m.vae_params, m.reference_params),
                    jnp.asarray(ref),
                    jnp.asarray(clip_img),
                )
            )
        if poses_f is not None:
            poses = poses_f.result()
        with self.timer.phase("pose_features"), self._mesh_ctx():
            pose_fea = jax.block_until_ready(
                self._pose_features_jit(m.pose_guider_variables, jnp.asarray(poses))
            )

        hlat, wlat = height // 8, width // 8
        key = (video_length, hlat, wlat, num_inference_steps, guidance_scale,
               windowed, self.window_fusion)
        if key not in self._compiled:
            with self.timer.phase("build_sampler"):
                self._compiled[key] = self._build_sampler(
                    video_length, hlat, wlat, num_inference_steps, guidance_scale,
                    windowed,
                )
        sampler = self._compiled[key]

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            rng, (1, video_length, hlat, wlat, 4), jnp.float32
        ) * self.m.scheduler.init_noise_sigma

        with self.timer.phase("denoise"), self._mesh_ctx():
            latents = jax.block_until_ready(
                sampler(m.denoising_params, latents, ctx_cfg, banks, pose_fea)
            )
        if interpolation_factor > 1:
            from aniportrait_tpu.pipelines.interpolation import interpolate_latents

            latents = interpolate_latents(latents, interpolation_factor, interp_method)

        with self.timer.phase("vae_decode"), self._mesh_ctx():
            video = self._decode(
                latents, decode_chunk, to_host=not return_device
            )
            if return_device:
                video = jax.block_until_ready(video)
                return video  # (L, H, W, 3) uint8 ON DEVICE (caller fetches)
        return video.astype(np.float32) / 255.0


class Pose2ImagePipeline(Pose2VideoPipeline):
    """Single-frame pipeline (reference pipeline_pose2img.py)."""

    def __call__(
        self,
        ref_image: np.ndarray,
        pose_image: np.ndarray,
        width: int,
        height: int,
        num_inference_steps: int = 25,
        guidance_scale: float = 3.5,
        seed: int = 42,
    ) -> np.ndarray:
        video = super().__call__(
            ref_image,
            [pose_image],
            None,
            width,
            height,
            video_length=1,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            seed=seed,
            windowed=False,
            decode_chunk=1,
        )
        return video[0]
