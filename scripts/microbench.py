"""Microbenchmarks for the hot compute units on the attached TPU chip.

Times each unit in isolation (jitted, donated, median of N) so kernel work
iterates without paying the full-pipeline compile:

  python -m scripts.microbench unet        # one denoising-UNet forward (CFG window)
  python -m scripts.microbench attn        # the big ref-KV spatial attention
  python -m scripts.microbench attn_sweep  # block_q/block_kv sweep for the flash kernel
  python -m scripts.microbench temporal    # motion-module temporal attention
  python -m scripts.microbench vae         # VAE decode of one 16-frame clip
  python -m scripts.microbench all
"""

import sys
import time

import numpy as np


def _sync(x):
    """Force completion THROUGH the axon tunnel: block_until_ready alone
    does not flush the remote queue — fetch a scalar reduction to host."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def _median(fn, n=5):
    _sync(fn())  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_unet(frames=16, latent=64):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    fn, args = g._flagship(size="full", frames=frames, latent=latent)
    jfn = jax.jit(fn)
    dt = _median(lambda: jfn(*args))
    # FLOP model: SD-1.5 UNet fwd ~0.35 TF per 64x64-latent image (convs)
    # + ref-KV spatial attention + temporal attention
    bf = args[1].shape[0] * frames
    tf = 0.35 * bf
    print(
        f"unet fwd (b=2 CFG, f={frames}, {latent}x{latent} latents): "
        f"{dt*1e3:.1f} ms  ~{tf/dt:.0f} TFLOP/s conv-only model "
        f"(v5e peak 197 bf16)"
    )
    return dt


def bench_unet_ablate(frames=16, latent=64):
    """UNet forward with pieces removed — in-context attribution of the
    step time (full vs no-reference-banks vs no-motion-modules)."""
    import jax

    import __graft_entry__ as g

    fn, args = g._flagship(size="full", frames=frames, latent=latent)
    params, x, t, ctx, pose, banks, drop = args
    jfn = jax.jit(fn)
    dt_full = _median(lambda: jfn(params, x, t, ctx, pose, banks, drop), 3)
    print(f"unet full:        {dt_full*1e3:.1f} ms")

    dt_nb = _median(lambda: jfn(params, x, t, ctx, pose, None, drop), 3)
    print(f"unet no banks:    {dt_nb*1e3:.1f} ms  (bank-KV attn cost "
          f"~{(dt_full-dt_nb)*1e3:.0f} ms)")

    import jax.numpy as jnp

    from aniportrait_tpu.factory import SIZES, build_model_defs

    defs = build_model_defs(size="full", use_motion_module=False,
                            dtype=jnp.bfloat16)
    unet_nm = defs["denoising_unet"]

    def fn_nm(params, latents, timesteps, context, pose_fea, ref_banks, drop):
        out, _ = unet_nm.apply(
            {"params": params}, latents, timesteps, context,
            pose_cond_fea=pose_fea, ref_banks=ref_banks, drop_ref=drop,
        )
        return out

    # motion-module params are simply unused by the no-motion graph
    jfn_nm = jax.jit(fn_nm)
    try:
        dt_nm = _median(lambda: jfn_nm(params, x, t, ctx, pose, banks, drop), 3)
        print(f"unet no motion:   {dt_nm*1e3:.1f} ms  (motion cost "
              f"~{(dt_full-dt_nm)*1e3:.0f} ms)")
    except Exception as e:
        print(f"unet no motion:   FAILED ({type(e).__name__}: {e})")


def _attn_shapes(res=64, heads=8, d=40, frames=16):
    rs = np.random.RandomState(0)
    sq = res * res
    b = 2 * frames  # CFG x frames rows
    q = rs.randn(b, sq, heads, d).astype(np.float32)
    k = rs.randn(b, 2 * sq, heads, d).astype(np.float32)
    v = rs.randn(b, 2 * sq, heads, d).astype(np.float32)
    drop = np.array([1] * frames + [0] * frames, np.int32)
    return q, k, v, drop, sq


def bench_attn(block_q=512, block_kv=1024, dtype="bfloat16", quiet=False):
    import jax.numpy as jnp

    from aniportrait_tpu.ops.pallas_attention import flash_attention

    q, k, v, drop, sq = _attn_shapes()
    dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    qj, kj, vj = (jnp.asarray(x, dt_) for x in (q, k, v))
    dj = jnp.asarray(drop)

    def run():
        return flash_attention(
            qj, kj, vj, drop_tail=dj, kv_split=sq,
            block_q=block_q, block_kv=block_kv,
        )

    dt = _median(run)
    b, _, h, d = q.shape
    flops = 2 * 2 * b * h * sq * (2 * sq) * d
    eff = flops / dt / 1e12
    if not quiet:
        print(
            f"flash attn 4096q/8192kv d={d} h={h} b={b} bq={block_q} "
            f"bkv={block_kv} {dtype}: {dt*1e3:.2f} ms  {eff:.1f} TFLOP/s useful"
        )
    return dt


def bench_attn_sweep():
    best = (1e9, None)
    for bq in (256, 512, 1024):
        for bkv in (512, 1024, 2048):
            try:
                dt = bench_attn(bq, bkv, quiet=False)
            except Exception as e:
                print(f"bq={bq} bkv={bkv}: FAIL {type(e).__name__}")
                continue
            if dt < best[0]:
                best = (dt, (bq, bkv))
    print(f"best: bq,bkv={best[1]} at {best[0]*1e3:.2f} ms")


def bench_temporal(frames=16, res=64, c=320, heads=8):
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.ops.attention import scaled_dot_product_attention

    rs = np.random.RandomState(0)
    rows = 2 * res * res  # CFG x spatial positions
    d = c // heads
    q = jnp.asarray(rs.randn(rows, frames, heads, d), jnp.bfloat16)

    fn = jax.jit(lambda q: scaled_dot_product_attention(q, q, q))

    def run():
        return fn(q)

    dt = _median(run)
    print(f"temporal attn rows={rows} f={frames} d={d}: {dt*1e3:.2f} ms")
    return dt


def bench_blocks(frames=16, res_lat=64, c=320, heads=8):
    """Per-block timings at the 64x64-latent full-size config (CFG rows):
    conv3x3, ResnetBlock3D, SpatialTransformer read (bank concat),
    MotionModule — to localise the UNet forward's time."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from aniportrait_tpu.models.motion_module import MotionModule
    from aniportrait_tpu.models.resnet import ResnetBlock3D
    from aniportrait_tpu.models.transformer_spatial import SpatialTransformer

    rs = np.random.RandomState(0)
    b = 2  # CFG
    x5 = jnp.asarray(
        rs.randn(b, frames, res_lat, res_lat, c) * 0.1, jnp.bfloat16
    )
    key = jax.random.PRNGKey(0)

    # plain conv3x3 (the UNet's workhorse)
    conv = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
    xc = x5.reshape(b * frames, res_lat, res_lat, c)
    cp = jax.jit(conv.init)(key, xc)
    cfn = jax.jit(lambda p, x: conv.apply(p, x))
    dt = _median(lambda: cfn(cp, xc))
    gf = 2 * 9 * (b * frames) * res_lat * res_lat * c * c / 1e9
    print(f"conv3x3 bf={b*frames} {res_lat}^2 c={c}: {dt*1e3:.2f} ms "
          f"({gf/dt/1e3:.0f} TFLOP/s)")

    res_blk = ResnetBlock3D(out_channels=c, dtype=jnp.bfloat16)
    temb = jnp.asarray(rs.randn(b, 1280), jnp.bfloat16)
    rp = jax.jit(res_blk.init)(key, x5, temb)
    rfn = jax.jit(lambda p, x, t: res_blk.apply(p, x, t))
    dt = _median(lambda: rfn(rp, x5, temb))
    print(f"resnet_block_3d: {dt*1e3:.2f} ms")

    st = SpatialTransformer(channels=c, heads=heads, cross_attention_dim=768,
                            dtype=jnp.bfloat16)
    ctx = jnp.asarray(rs.randn(b, 1, 768), jnp.bfloat16)
    bank = jnp.asarray(rs.randn(b, res_lat * res_lat, c) * 0.1, jnp.bfloat16)
    sp = jax.jit(lambda k: st.init(k, x5, context=ctx, ref_bank=bank))(key)
    sfn = jax.jit(
        lambda p, x, cx, bk: st.apply(
            p, x, context=cx, ref_bank=bk, drop_mode="first_half"
        )[0]
    )
    dt = _median(lambda: sfn(sp, x5, ctx, bank))
    print(f"spatial_transformer (ref-KV, CFG split): {dt*1e3:.2f} ms")

    mm = MotionModule(channels=c, heads=heads, dtype=jnp.bfloat16)
    mp = jax.jit(mm.init)(key, x5)
    mfn = jax.jit(lambda p, x: mm.apply(p, x))
    dt = _median(lambda: mfn(mp, x5))
    print(f"motion_module: {dt*1e3:.2f} ms")


def bench_pose(frames=16, res=512):
    """Pose-guider feature extraction for one clip (runs once per clip,
    hoisted out of the denoise loop)."""
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs, init_random_params

    defs = build_model_defs(size="full", dtype=jnp.bfloat16)
    modules = init_random_params(defs)
    pg_v = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), modules.pose_guider_variables
    )
    rs = np.random.RandomState(0)
    poses = jnp.asarray(
        rs.randint(0, 255, (1, frames, res, res, 3), np.uint8)
    )

    pg = jax.jit(
        lambda v, p: modules.pose_guider.apply(
            v, p.astype(jnp.bfloat16) / 127.5 - 1.0
        )
    )
    dt = _median(lambda: pg(pg_v, poses))
    print(f"pose features (f={frames}, {res}px): {dt*1e3:.1f} ms")
    return dt


def bench_vae(frames=16, res=512, chunk=4):
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs, init_random_params

    defs = build_model_defs(size="full", dtype=jnp.bfloat16)
    modules = init_random_params(defs)
    vae_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), modules.vae_params)
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(chunk, res // 8, res // 8, 4), jnp.bfloat16)

    dec = jax.jit(
        lambda p, z: modules.vae.apply({"params": p}, z, method=modules.vae.decode)
    )
    dt = _median(lambda: dec(vae_p, lat))
    per_clip = dt * frames / chunk
    print(f"vae decode chunk={chunk} {res}px: {dt*1e3:.1f} ms  "
          f"(~{per_clip:.2f} s / {frames}-frame clip)")
    return dt


def bench_stage2_step(frames=16, res=512, batch=1, device_init=True):
    """Full-size stage-2 training step (motion-module training, bf16 compute
    + remat per reference stage2.yaml:11) on the real chip — the HBM
    acceptance test for gradient checkpointing (VERDICT r1 item 5).

    device_init=True (default, VERDICT r2 item 4): the whole training state
    (params in their final stage-2 dtypes + optimizer zeros) is materialised
    ON DEVICE by one jitted program — no host copy ever exists and the
    ~10 GB state upload through the tunnel (measured ~18 min on a slow
    window) disappears.  Timing is value-independent (XLA compiles on
    shapes), so zero-filled weights bench identically to converted ones."""
    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs, init_random_params
    from aniportrait_tpu.train.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    defs = build_model_defs(
        size="full", use_motion_module=True, dtype=jnp.bfloat16,
        gradient_checkpointing=True,
    )
    # abstract init (numpy zeros, host RAM only): materialising f32 params
    # on device and THEN casting frozen->bf16 would keep both copies alive
    # (~14 GB) before the step even starts — build the final-dtype tree
    # abstractly and materialise exactly once (on device or via one upload).
    from aniportrait_tpu.factory import init_abstract_params
    from aniportrait_tpu.train.train_step import cast_frozen_to_bf16

    modules = init_abstract_params(defs)
    params = {
        "reference": modules.reference_params,
        "denoising": modules.denoising_params,
        "pose_guider": modules.pose_guider_variables["params"],
    }
    params = cast_frozen_to_bf16(params, stage=2)
    tx = make_optimizer(params, stage=2)
    step = make_train_step(defs, tx, defs["scheduler"], stage=2)
    opt_state = jax.tree.map(
        lambda sh: np.zeros(sh.shape, sh.dtype), jax.eval_shape(tx.init, params)
    )
    state = TrainState(
        params, modules.pose_guider_variables["batch_stats"],
        opt_state, np.zeros((), np.int32),
    )
    frozen = jax.tree.map(
        lambda x: np.asarray(x, jnp.bfloat16),
        (modules.vae_params, modules.clip_params),
    )
    t0 = time.perf_counter()
    if device_init:
        print("materialising state on device (no host upload)...", flush=True)
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (state, frozen)
        )
        state, frozen = jax.jit(
            lambda: jax.tree.map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes
            )
        )()
    else:
        print("placing state on device (one-time ~10 GB upload)...", flush=True)
        state = jax.device_put(state)
        frozen = jax.device_put(frozen)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    print(f"state on device in {time.perf_counter()-t0:.0f}s", flush=True)
    rs = np.random.RandomState(0)
    img = defs["clip"].image_size if hasattr(defs["clip"], "image_size") else 224
    batch_data = {
        "pixel_values": rs.randn(batch, frames, res, res, 3).astype(np.float32),
        "pixel_values_pose": rs.randn(batch, frames, res, res, 3).astype(np.float32),
        "pixel_values_ref_img": rs.randn(batch, res, res, 3).astype(np.float32),
        "clip_ref_image": rs.randn(batch, img, img, 3).astype(np.float32),
    }
    rng = jax.random.PRNGKey(0)
    holder = {"state": state}

    def run():
        new_state, metrics = step(holder["state"], frozen, batch_data, rng)
        holder["state"] = new_state  # buffers are donated
        return metrics["loss"]

    dt = _median(run, 3)
    hbm = ""
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "peak_bytes_in_use" in ms:
            hbm = f"; HBM peak {ms['peak_bytes_in_use'] / 2**30:.2f} GiB"
    except Exception:
        pass
    print(
        f"stage-2 step (b={batch}, f={frames}, {res}px, bf16+remat): "
        f"{dt:.2f} s/step{hbm}"
    )
    return dt


def bench_stage2_run(steps=60, frames=16, res=512, batch=1, size="full",
                     out_json="docs/stage2_run_r5.json",
                     ckpt_dir="output/stage2_run_ckpt",
                     val_dir="output/stage2_run_val"):
    return bench_train_run(
        stage=2, steps=steps, frames=frames, res=res, batch=batch, size=size,
        out_json=out_json, ckpt_dir=ckpt_dir, val_dir=val_dir,
    )


def bench_stage1_run(steps=60, res=512, batch=2, size="full",
                     out_json="docs/stage1_run_r5.json",
                     ckpt_dir="output/stage1_run_ckpt",
                     val_dir="output/stage1_run_val"):
    """Stage-1 full-size RUN (VERDICT r4 item 4): the reference's 300k-step
    workhorse config — batch 2, single frames, 512^2, ReferenceNet +
    denoising UNet + PoseGuider trainable (train_stage_1.py:489-658)."""
    return bench_train_run(
        stage=1, steps=steps, frames=1, res=res, batch=batch, size=size,
        out_json=out_json, ckpt_dir=ckpt_dir, val_dir=val_dir,
    )


def bench_train_run(stage, steps=60, frames=16, res=512, batch=1,
                    size="full", out_json="docs/train_run.json",
                    ckpt_dir="output/train_run_ckpt",
                    val_dir="output/train_run_val",
                    adam_8bit=None):
    """Full-size training RUN, not step (VERDICT r3 item 6 / r4 item 4):
    ``steps`` steps on synthetic data with the loss curve recorded, Orbax
    save->restore round trips at full size (full-state AND trainable-only,
    both bit-equal), one validation grid via train/validation.py, s/step
    variance and the compile-time HBM bound (scripts/memory_report.py).

    Parameters are materialised ON DEVICE with the same statistical pattern
    as factory._fill_abstract (norm scales 1, biases 0, else N(0, 0.02)) so
    the loss has a real signal path into the trainable modules — all-zero
    weights would zero the motion-module gradients (proj_out is zero-init
    by design) and flatline the curve."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from aniportrait_tpu.factory import build_model_defs, init_abstract_params
    from aniportrait_tpu.train.train_step import (
        TrainState,
        cast_frozen_to_bf16,
        make_optimizer,
        make_train_step,
    )

    defs = build_model_defs(
        size=size, use_motion_module=(stage == 2), dtype=jnp.bfloat16,
        gradient_checkpointing=True,
    )
    modules = init_abstract_params(defs)
    params = {
        "reference": modules.reference_params,
        "denoising": modules.denoising_params,
        "pose_guider": modules.pose_guider_variables["params"],
    }
    params = cast_frozen_to_bf16(params, stage=stage)
    # stage-1's full trainable set needs 8-bit Adam moments to fit one
    # 16 GiB chip (the reference's own use_8bit_adam lever,
    # train_stage_1.py:366-376; docs/memory_r5.json stage-1 rows)
    if adam_8bit is None:
        adam_8bit = stage == 1
    tx = make_optimizer(params, stage=stage, adam_8bit=adam_8bit)
    step_fn = make_train_step(defs, tx, defs["scheduler"], stage=stage)
    opt_state = jax.tree.map(
        lambda sh: np.zeros(sh.shape, sh.dtype), jax.eval_shape(tx.init, params)
    )
    state = TrainState(
        params, modules.pose_guider_variables["batch_stats"],
        opt_state, np.zeros((), np.int32),
    )
    frozen = jax.tree.map(
        lambda x: np.asarray(x, jnp.bfloat16),
        (modules.vae_params, modules.clip_params),
    )

    # device-side statistically-sane init: ONE jitted program, no host copy
    # of the ~10 GB state ever exists (the tunnel upload took ~18 min on a
    # slow window)
    t0 = time.perf_counter()
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (state, frozen)
    )
    leaf_idx = {"i": -1}

    def dev_fill(path, sh):
        leaf_idx["i"] += 1
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        # optimizer state MUST stay zeros: Adam's second moment (nu) is a
        # running mean of SQUARED grads — filling it with N(0, 0.02) puts
        # negative values under adamw's sqrt and the first update turns the
        # trainable params (and every later loss) NaN
        if "opt_state" in jax.tree_util.keystr(path):
            return jnp.zeros(sh.shape, sh.dtype)
        if name in ("scale", "var", "norm_scale"):
            return jnp.ones(sh.shape, sh.dtype)
        if name in ("bias", "mean", "norm_bias") or not jnp.issubdtype(
            sh.dtype, jnp.floating
        ):
            return jnp.zeros(sh.shape, sh.dtype)
        k = jax.random.fold_in(jax.random.PRNGKey(0), leaf_idx["i"])
        return (jax.random.normal(k, sh.shape, jnp.float32) * 0.02).astype(
            sh.dtype
        )

    state, frozen = jax.jit(
        lambda: jax.tree_util.tree_map_with_path(dev_fill, shapes)
    )()
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    print(f"state materialised on device in {time.perf_counter()-t0:.0f}s",
          flush=True)

    rs = np.random.RandomState(0)
    img = defs["clip"].image_size if hasattr(defs["clip"], "image_size") else 224
    batch_data = {
        "pixel_values": rs.randn(batch, frames, res, res, 3).astype(np.float32),
        "pixel_values_pose": rs.randn(batch, frames, res, res, 3).astype(np.float32),
        "pixel_values_ref_img": rs.randn(batch, res, res, 3).astype(np.float32),
        "clip_ref_image": rs.randn(batch, img, img, 3).astype(np.float32),
    }
    batch_dev = jax.device_put(batch_data)

    losses, times = [], []
    for i in range(steps):
        rng = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, frozen, batch_dev, rng)
        loss = float(metrics["loss"])  # blocks
        dt = time.perf_counter() - t0
        losses.append(loss)
        times.append(dt)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}: loss {loss:.4f}  {dt:.2f}s", flush=True)
    assert np.isfinite(losses).all(), "non-finite loss in the run"

    hbm = None
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "peak_bytes_in_use" in ms:
            hbm = ms["peak_bytes_in_use"] / 2**30
    except Exception:
        pass

    # Orbax round trip at full size — the TRAINABLE-ONLY path (r5): frozen
    # bf16 subtrees are reconstructible from weight conversion, so the
    # production checkpoint excludes them (train/checkpoint.py).  The r4
    # full-state save measured 680 s for ~10 GB, dominated by the
    # device->host fetch of those frozen leaves through the tunnel.
    from aniportrait_tpu.train.checkpoint import (
        _split_trainable,
        restore_checkpoint,
        restore_train_checkpoint,
        save_checkpoint,
        save_train_checkpoint,
    )

    # fresh checkpoint dir: a stale higher-step checkpoint from a previous
    # run makes Orbax silently skip the save (step < latest) and the
    # round-trip assert below read the old state
    import shutil

    shutil.rmtree(ckpt_dir, ignore_errors=True)

    step_now = int(state.step)
    saved_sub, _ = _split_trainable(state, stage)
    bytes_train = sum(
        np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(saved_sub)
    )
    bytes_full = sum(
        np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(state)
    )
    t0 = time.perf_counter()
    save_train_checkpoint(ckpt_dir, state, step_now, stage=stage)
    t_save = time.perf_counter() - t0
    template = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), state)
    t0 = time.perf_counter()
    restored, got_step = restore_train_checkpoint(
        ckpt_dir, template, stage=stage
    )
    t_restore = time.perf_counter() - t0
    assert got_step == step_now and int(restored.step) == step_now
    host_state = jax.device_get(state)
    # frozen leaves in the zero template stay zero after restore — compare
    # ONLY what the checkpoint owns (trainables/opt/stats/step); frozen
    # round-trip equality is the template's job (tests cover the merge)
    saved_host, _ = _split_trainable(host_state, stage)
    saved_rest, _ = _split_trainable(restored, stage)
    for a, b in zip(jax.tree.leaves(saved_host), jax.tree.leaves(saved_rest)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(
        f"orbax trainable-only round trip OK at step {step_now}: save "
        f"{t_save:.0f}s / restore {t_restore:.0f}s for "
        f"{bytes_train/2**30:.2f} GiB of trainable state (full state "
        f"{bytes_full/2**30:.2f} GiB; r4 full-save baseline 680 s)",
        flush=True,
    )
    t_save_full = t_restore_full = None
    if os.environ.get("MEASURE_FULL_SAVE") == "1":
        t0 = time.perf_counter()
        save_checkpoint(ckpt_dir + "_full", state, step_now)
        t_save_full = time.perf_counter() - t0
        t0 = time.perf_counter()
        restored_f, _ = restore_checkpoint(ckpt_dir + "_full", template)
        t_restore_full = time.perf_counter() - t0
        for a, b in zip(jax.tree.leaves(host_state), jax.tree.leaves(restored_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"orbax FULL round trip: save {t_save_full:.0f}s / restore "
              f"{t_restore_full:.0f}s", flush=True)

    # one validation grid through the real pipeline
    from aniportrait_tpu.train.validation import log_validation

    class _SynthDataset:
        def __len__(self):
            return 1

        def validation_sample(self, _):
            r = np.random.RandomState(7)
            return {
                "ref_image": r.randint(0, 255, (res, res, 3), np.uint8),
                "pose_images": [
                    r.randint(0, 255, (res, res, 3), np.uint8)
                    for _ in range(frames)
                ],
                "frames": [r.randint(0, 255, (res, res, 3), np.uint8)],
            }

    t0 = time.perf_counter()
    log_validation(
        defs, frozen[0], frozen[1], state, _SynthDataset(), val_dir,
        step=step_now, n_samples=1, image_mode=(stage == 1), width=res,
        height=res, num_inference_steps=5,
    )
    t_val = time.perf_counter() - t0
    grids = os.listdir(val_dir)
    assert grids, "validation wrote nothing"
    print(f"validation grid written ({grids[0]}) in {t_val:.0f}s", flush=True)

    report = {
        "stage": stage,
        "adam_8bit": bool(adam_8bit),
        "steps": steps,
        "frames": frames,
        "res": res,
        "batch": batch,
        "losses": losses,
        "s_per_step_median": float(np.median(times)),
        "s_per_step_std_excl_first": float(np.std(times[1:])),
        "hbm_peak_gib": hbm,
        "hbm_note": ("runtime memory_stats unavailable on this backend; "
                     "compile-time bound in docs/memory_r5.json"),
        "ckpt_trainable_gib": float(bytes_train / 2**30),
        "ckpt_full_gib": float(bytes_full / 2**30),
        "orbax_save_s": t_save,
        "orbax_restore_s": t_restore,
        "orbax_full_save_s": t_save_full,
        "orbax_full_restore_s": t_restore_full,
        "restored_bit_equal": True,
        "validation_grid": sorted(grids),
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"stage-{stage} RUN: {steps} steps, loss {losses[0]:.4f} -> "
        f"{losses[-1]:.4f}, {report['s_per_step_median']:.2f} s/step "
        f"(std {report['s_per_step_std_excl_first']:.3f} excl. step 0)"
        + (f", HBM peak {hbm:.2f} GiB" if hbm else "")
    )
    return report


def bench_film(res=512, batch=4):
    """One warm FiLM midpoint call (the -acc interpolator)."""
    import numpy as np

    from aniportrait_tpu.utils.frame_interpolation import (
        init_frame_interpolation_model,
    )

    film = init_frame_interpolation_model(weights_path=None, random_init=True)
    rs = np.random.RandomState(0)
    a = rs.rand(batch, res, res, 3).astype(np.float32)
    b = rs.rand(batch, res, res, 3).astype(np.float32)
    film(a, b)  # compile
    dt = _median(lambda: film(a, b), 3)
    print(f"film midpoint batch={batch} {res}px: {dt*1e3:.1f} ms "
          f"({dt/batch*1e3:.1f} ms/frame)")
    return dt


def bench_tunnel():
    """Host<->device transfer + dispatch round-trip through the axon tunnel
    (the chip is remote; HTTP tunnel throughput varies run to run)."""
    import jax
    import jax.numpy as jnp

    # dispatch round-trip: tiny op + scalar fetch
    x = jnp.zeros((8, 128), jnp.float32)
    rt = _median(lambda: x + 1.0, 5)
    print(f"dispatch+scalar-fetch round trip: {rt*1e3:.1f} ms")

    # upload: 12.6 MB uint8 (one 16-frame 512px pose video)
    buf = np.zeros((16, 512, 512, 3), np.uint8)

    def up():
        return jnp.asarray(buf)

    dt = _median(up, 3)
    print(f"upload 12.6 MB uint8: {dt*1e3:.1f} ms ({buf.nbytes/dt/1e6:.0f} MB/s)")

    # download: 12.6 MB
    dev = jnp.asarray(buf)

    def down():
        return np.asarray(dev)

    t0 = time.perf_counter()
    for _ in range(3):
        down()
    dd = (time.perf_counter() - t0) / 3
    print(f"download 12.6 MB uint8: {dd*1e3:.1f} ms ({buf.nbytes/dd/1e6:.0f} MB/s)")


def main():
    from aniportrait_tpu.utils.jax_setup import setup

    setup()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "stage2":
        return bench_stage2_step()
    if which == "stage2_run":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
        return bench_stage2_run(steps=steps)
    if which == "stage1_run":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
        return bench_stage1_run(steps=steps)
    if which in ("tunnel", "all"):
        bench_tunnel()
    if which in ("unet", "all"):
        bench_unet()
    if which in ("attn", "all"):
        bench_attn()
    if which == "attn_sweep":
        bench_attn_sweep()
    if which in ("temporal", "all"):
        bench_temporal()
    if which in ("pose", "all"):
        bench_pose()
    if which == "blocks":
        bench_blocks()
    if which == "unet_ablate":
        bench_unet_ablate()
    if which == "film":
        bench_film()
    if which in ("vae", "all"):
        bench_vae()


if __name__ == "__main__":
    main()
