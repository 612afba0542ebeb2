"""Multi-chip scaling evidence (VERDICT r2 item 5).

Runs BOTH driver dryrun entries (stage-1 train step; window-sharded
inference sampler) at 2/4/8 virtual devices, asserting sharded-vs-single
numerical parity and recording per-step wall times.

Interpretation caveat, stated up front: this host has ONE physical core, so
n virtual CPU devices time-slice it — wall-clock CANNOT show speedup here.
What these runs prove is (a) the sharded programs compile and execute at
every mesh size, (b) they produce the same numbers as the single-device
program (parity), and (c) the collective structure is sane (the only
cross-device traffic in the inference sampler is the scatter-add of
overlapping window noise predictions — KBs of latents per step).  The v5e-8
throughput projection is therefore arithmetic on the MEASURED single-chip
slot rate (BASELINE.md), not an extrapolation of these CPU times:

    slot_rate      = measured single-chip frames/s on the 16-frame
                     single-window config (each frame == one window slot)
    slots_per_frame(L) = ceil((L - overlap)/(window - overlap)) * window
                         padded up to a multiple of the chips, / L
    v5e-8 f/s(L)   = 8 * slot_rate / slots_per_frame(L)

Run: python -m scripts.bench_multichip_scaling  (CPU only, ~10 min warm)
"""

import time

import numpy as np


def projection_table(slot_rate: float, window=16, overlap=4, chips=8):
    """The v5e-8 arithmetic for the EXACT windowed path, printed so
    BASELINE.md can cite it."""
    rows = []
    for L in (48, 120, 300):
        n_win = -(-(L - overlap) // (window - overlap))
        # CFG doubles the row axis: shardable work units = 2 * n_win
        units = 2 * n_win
        pad_units = -(-units // chips) * chips
        slots_per_frame = (pad_units / 2) * window / L
        fps = chips * slot_rate / slots_per_frame
        rows.append((L, n_win, pad_units / units, slots_per_frame, fps))
    return rows


def projection_table_fused(slot_rate: float, fused_eff: float, chips=8):
    """v5e-8 arithmetic for the FUSED whole-clip path sharded CFG-pair x
    frame-blocks (pipelines/pose2vid.py mesh2).

    slot_rate: measured single-chip frames/s at the 16-frame whole-clip
    config (a frame = its CFG pair of UNet rows).
    fused_eff: measured single-chip fused f/s divided by slot_rate at the
    same L — folds in the motion re-window overhead (wide_motion_windows,
    1.0-1.08x slots) and the per-module overlap means.

    Aggregate rate = chips * slot_rate * fused_eff frames/s; the only pack
    loss is padding L to a multiple of the frame ways (chips/2 at CFG 2):
        fps(L) = chips * slot_rate * fused_eff * L / pad(L)."""
    rows = []
    frame_ways = chips // 2
    for L in (48, 120, 300):
        pad_frames = -(-L // frame_ways) * frame_ways
        pack = L / pad_frames
        fps = chips * slot_rate * fused_eff * pack
        rows.append((L, pad_frames, pack, fps))
    return rows


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
                "pred": 1, "f64": 8, "s8": 1}


def collective_report(hlo_text, steps):
    """Sum the bytes moved by every collective in an optimized sharded HLO
    module (the MEASURED counterpart of the projection's 'scatter-add is
    KBs/step over ICI' assumption).  Collectives inside the denoise scan
    body execute once per step; the while body appears once in the text, so
    per-clip bytes = body bytes x steps (upper bound for the few outside).

    Matches BOTH the synchronous forms (``all-reduce(``) and the async
    pairs optimized TPU HLO emits (``all-reduce-start(`` /
    ``collective-permute-start(``); the ``-done`` halves are skipped so
    nothing double-counts.  Tuple results have EVERY element summed —
    async starts alias (input, output[, context]) buffers, so the number
    is an upper bound on wire bytes."""
    import re

    totals = {}
    op = re.compile(
        r"=\s*(.*?)\s"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)(-start)?\("
    )
    shape = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = op.search(line)
        if not m:
            continue
        kind = m.group(2)
        for dt, dims in shape.findall(m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            totals[kind] = totals.get(kind, 0) + n * _DTYPE_BYTES.get(dt, 4)
    per_step = sum(totals.values())
    return totals, per_step, per_step * steps


def audit_collectives(modules, mesh, fused, steps=2):
    """Lower+compile the sharded micro sampler and report its collective
    bytes (per denoise step and per clip)."""
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    pipe = Pose2VideoPipeline(
        modules, context_frames=4, context_overlap=2,
        window_batch=max(mesh.devices.size // 2, 1), mesh=mesh,
        window_fusion=fused,
    )
    res, frames = 32, 8
    clip_size = modules.clip.image_size
    ref_sds = jax.ShapeDtypeStruct((1, res, res, 3), jnp.uint8)
    clip_sds = jax.ShapeDtypeStruct((1, clip_size, clip_size, 3), jnp.uint8)
    poses_sds = jax.ShapeDtypeStruct((1, frames, res, res, 3), jnp.uint8)
    ctx_sh, _, banks_sh = jax.eval_shape(
        pipe._encode_reference,
        (modules.clip_params, modules.vae_params, modules.reference_params),
        ref_sds, clip_sds)
    pose_sh = jax.eval_shape(
        pipe._pose_features, modules.pose_guider_variables, poses_sds)
    sampler = pipe._build_sampler(frames, res // 8, res // 8, steps, 3.5, True)
    lat = jax.ShapeDtypeStruct((1, frames, res // 8, res // 8, 4), jnp.float32)
    # lower under the pipeline's canonical 2-D mesh (Shardy wants ONE mesh
    # per program; the caller's 1-D view would mix meshes once the
    # partitioned Pallas kernels are present)
    with pipe._mesh_ctx():
        txt = sampler.lower(
            modules.denoising_params, lat, ctx_sh, banks_sh, pose_sh
        ).compile().as_text()
    return collective_report(txt, steps)


def main():
    import jax

    import __graft_entry__ as g

    # --- timings + parity at 2/4/8 devices -------------------------------
    # _ensure_n_devices switches to virtual CPU; call with the LARGEST mesh
    # first so every size fits the same backend config
    g._ensure_n_devices(8)

    from aniportrait_tpu.factory import build_model_defs, init_abstract_params
    from aniportrait_tpu.parallel.mesh import make_mesh
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline

    defs = build_model_defs(size="micro", use_motion_module=True)
    modules = init_abstract_params(defs)

    rs = np.random.RandomState(1)
    ref_img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    poses = [rs.randint(0, 255, (32, 32, 3), np.uint8) for _ in range(8)]
    kw = dict(width=32, height=32, video_length=8, num_inference_steps=2,
              guidance_scale=3.5, seed=0, windowed=True, decode_chunk=4)

    def run_inference(mesh, wb, fused=False):
        pipe = Pose2VideoPipeline(
            modules, context_frames=4, context_overlap=2,
            window_batch=wb, mesh=mesh, window_fusion=fused,
        )
        ctx = mesh if mesh is not None else _null()
        with ctx:
            pipe(ref_img, poses, None, **kw)  # compile
            t0 = time.perf_counter()
            video = np.asarray(pipe(ref_img, poses, None, **kw))
            return video, time.perf_counter() - t0

    class _null:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    print("inference sampler (micro, 8 frames, 2 steps, window-sharded):")
    base_video, t1 = run_inference(None, 2)
    print(f"  1 device : warm {t1:.2f}s  (reference output)")
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        video, t = run_inference(mesh, max(n // 2, 1))
        err = float(np.abs(video.astype(np.float64) -
                           base_video.astype(np.float64)).max())
        ok = "parity OK" if err <= 2 / 255.0 + 1e-12 else f"PARITY FAIL {err}"
        print(f"  {n} devices: warm {t:.2f}s  max|Δ| {err:.2e}  {ok}")
        assert err <= 2 / 255.0 + 1e-12, err

    print("FUSED sampler (whole-clip pass, cfg x frame-block sharded):")
    base_fused, t1 = run_inference(None, 1, fused=True)
    print(f"  1 device : warm {t1:.2f}s  (reference output)")
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        video, t = run_inference(mesh, max(n // 2, 1), fused=True)
        err = float(np.abs(video.astype(np.float64) -
                           base_fused.astype(np.float64)).max())
        ok = "parity OK" if err <= 2 / 255.0 + 1e-12 else f"PARITY FAIL {err}"
        print(f"  {n} devices: warm {t:.2f}s  max|Δ| {err:.2e}  {ok}")
        assert err <= 2 / 255.0 + 1e-12, err

    # --- collective traffic audit (8-device mesh) -------------------------
    # measures the projection's "cross-device traffic is small" assumption
    # from the compiled programs themselves
    from aniportrait_tpu.parallel.mesh import make_mesh as _mk

    for fused, label in ((False, "windowed-exact"), (True, "fused")):
        kinds, per_step, per_clip = audit_collectives(
            modules, _mk(8), fused, steps=2
        )
        pretty = ", ".join(f"{k} {v/1024:.1f} KiB" for k, v in sorted(kinds.items()))
        print(
            f"collectives [{label}, 8 devices, micro 8f]: "
            f"{per_step/1024:.1f} KiB/step ({pretty or 'none'})"
        )

    # --- train step at 2/4/8 ---------------------------------------------
    print("stage-1 train step (micro, dryrun_multichip):")
    for n in (2, 4, 8):
        t0 = time.perf_counter()
        g.dryrun_multichip(n)
        print(f"  {n} devices: step+checks {time.perf_counter() - t0:.1f}s")

    # --- the projection ---------------------------------------------------
    # r5 measured rates (BASELINE.md): driver single-window 1.857 f/s; the
    # slots-per-frame arithmetic is VALIDATED by the measured 48f exact run
    # (1.393 f/s ~= 1.857 / 1.33 slots)
    slot_rate = 1.857
    print(f"\nv5e-8 EXACT projection (slot rate {slot_rate} f/s per chip, window 16/4):")
    print("  L    windows  pack-eff  slots/frame  projected f/s  (vs 1.0 A100 model)")
    for L, n_win, pack, spf, fps in projection_table(slot_rate):
        print(
            f"  {L:<4} {n_win:<8} {1/pack:<9.2f} {spf:<12.2f} {fps:<14.2f} {fps:.1f}x"
        )

    # fused_eff: measured single-chip fused f/s / slot rate — r5 measured
    # at TWO lengths (48f: 1.632/1.857 = 0.879; 64f: 1.615/1.857 = 0.870),
    # validating the flat-in-L assumption; use the lower
    fused_eff = 1.615 / slot_rate
    print(
        f"\nv5e-8 FUSED projection (slot rate {slot_rate}, fused eff "
        f"{fused_eff:.2f} from the measured 48f+64f fused runs):"
    )
    print("  L    pad-frames  pack-eff  projected f/s  (vs 1.0 A100 model)")
    for L, pad, pack, fps in projection_table_fused(slot_rate, fused_eff):
        print(f"  {L:<4} {pad:<11} {pack:<9.2f} {fps:<14.2f} {fps:.1f}x")


if __name__ == "__main__":
    main()
