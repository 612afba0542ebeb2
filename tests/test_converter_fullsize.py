"""FULL-SIZE key bijection for the weight converter (VERDICT r2 item 2).

For every checkpoint family in the reference's weight contract
(reference README.md:100-145), synthesize the COMPLETE torch state dict at
full size (tests/keygen_torch.py), run it through weights/convert.py, and
assert strictness in BOTH directions against the full-size flax module
trees:
  * zero unconsumed torch keys (nothing a real checkpoint ships is dropped
    silently), and
  * zero missing / zero extra flax paths (every parameter the model needs is
    produced — loading real weights can never leave a random-initialised
    leaf behind), and
  * every leaf shape matches the model's.

The flax side uses jax.eval_shape (no compilation, no memory); the torch
side uses zero-filled arrays (calloc — cheap at any size).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import keygen_torch as kg

from aniportrait_tpu.factory import FULL, pose_feature_shapes


def zeros_sd(keys):
    return {k: np.zeros(s, np.float32) for k, s in keys.items()}


def flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flat(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def assert_bijection(converted, model_tree, family):
    got = flat(converted)
    want = flat(model_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{family}: converter leaves {len(missing)} model params unfilled, e.g. {missing[:8]}"
    assert not extra, f"{family}: converter writes {len(extra)} paths absent from the model, e.g. {extra[:8]}"
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{family}: {len(bad)} shape mismatches, e.g. {bad[:8]}"


@pytest.fixture(scope="module")
def unet_shapes():
    from aniportrait_tpu.models.unet import AniUNet

    x = jnp.zeros((1, 1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 768))
    pose_fea = [jnp.zeros(s) for s in pose_feature_shapes(FULL, 1, 1, 8)]

    den = AniUNet(**FULL["unet"], use_motion_module=True)
    den_tree = jax.eval_shape(
        lambda k: den.init(k, x, t, ctx, pose_cond_fea=pose_fea),
        jax.random.PRNGKey(0),
    )["params"]
    ref = AniUNet(**FULL["unet"], use_motion_module=False, has_output_head=False)
    ref_tree = jax.eval_shape(
        lambda k: ref.init(k, x, t, ctx, capture_banks=True),
        jax.random.PRNGKey(0),
    )["params"]
    return den_tree, ref_tree


def test_denoising_unet_fullsize_bijection(unet_shapes):
    """SD-1.5 base + mm_sd_v15_v2 overlay == the reference's
    from_pretrained_2d merge (unet_3d.py:582-673) == denoising_unet.pth."""
    from aniportrait_tpu.weights.convert import convert_unet

    sd = zeros_sd(kg.denoising_unet_keys())
    converted, unused = convert_unet(sd, has_output_head=True)
    assert not unused, f"unconsumed torch keys: {unused[:8]} (+{len(unused)} total)"
    assert_bijection(converted, unet_shapes[0], "denoising_unet")


def test_reference_unet_fullsize_bijection(unet_shapes):
    """SD-1.5 base overlaid with reference_unet.pth (same key set); the
    ReferenceNet has no output head (reference unet_2d_condition.py:645-652)
    so the head keys must be the ONLY leftovers."""
    from aniportrait_tpu.weights.convert import convert_unet

    sd = zeros_sd(kg.sd15_unet_keys())
    converted, unused = convert_unet(sd, has_output_head=False)
    head = {"conv_norm_out.weight", "conv_norm_out.bias",
            "conv_out.weight", "conv_out.bias"}
    assert set(unused) <= head, f"unexpected leftovers: {sorted(set(unused) - head)[:8]}"
    assert_bijection(converted, unet_shapes[1], "reference_unet")


def test_vae_fullsize_bijection():
    from aniportrait_tpu.models.vae import AutoencoderKL
    from aniportrait_tpu.weights.convert import convert_vae

    sd = zeros_sd(kg.vae_keys())
    converted, unused = convert_vae(sd)
    assert not unused, unused[:8]
    vae = AutoencoderKL(**FULL["vae"])
    tree = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    assert_bijection(converted, tree, "vae")


def test_clip_fullsize_bijection():
    from aniportrait_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from aniportrait_tpu.weights.convert import convert_clip_vision

    sd = zeros_sd(kg.clip_vision_keys())
    converted, unused = convert_clip_vision(sd)
    assert not unused, unused[:8]
    clip = CLIPVisionModelWithProjection(**FULL["clip"])
    tree = jax.eval_shape(
        clip.init, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    assert_bijection(converted, tree, "clip_vision")


def test_pose_guider_fullsize_bijection():
    from aniportrait_tpu.models.pose_guider import PoseGuider
    from aniportrait_tpu.weights.convert import convert_pose_guider

    sd = zeros_sd(kg.pose_guider_keys())
    variables, unused = convert_pose_guider(sd)
    assert not unused, unused[:8]
    pg = PoseGuider(**FULL["pose_guider"])
    init_vars = jax.eval_shape(
        pg.init, jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    assert_bijection(variables["params"], init_vars["params"], "pose_guider.params")
    assert_bijection(
        variables["batch_stats"], init_vars["batch_stats"], "pose_guider.stats"
    )


def test_wav2vec2_fullsize_bijection():
    from aniportrait_tpu.audio.wav2vec2 import Wav2Vec2Model
    from aniportrait_tpu.weights.convert import convert_wav2vec2

    sd = zeros_sd(kg.wav2vec2_keys())
    converted, unused = convert_wav2vec2(sd)
    assert not unused, unused[:8]
    enc = Wav2Vec2Model()
    tree = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 16000)), 30),
        jax.random.PRNGKey(0),
    )["params"]
    assert_bijection(converted, tree, "wav2vec2")


def test_wav2vec2_parametrized_weight_norm_spelling():
    """Newer torch spells the positional conv's weight norm as
    parametrizations.weight.original0/1 — the converter must fold it the
    same way it folds the published weight_g/weight_v spelling."""
    from aniportrait_tpu.weights.convert import convert_wav2vec2

    keys = kg.wav2vec2_keys()
    base = "encoder.pos_conv_embed.conv"
    spellings = {f"{base}.weight_g", f"{base}.weight_v",
                 f"{base}.parametrizations.weight.original0",
                 f"{base}.parametrizations.weight.original1"}
    present = spellings & set(keys)
    assert present, "meta module lost the weight-norm keys entirely?"
    sd = zeros_sd(keys)
    # rewrite to the OTHER spelling and convert again
    if f"{base}.weight_g" in sd:
        sd[f"{base}.parametrizations.weight.original0"] = sd.pop(f"{base}.weight_g")
        sd[f"{base}.parametrizations.weight.original1"] = sd.pop(f"{base}.weight_v")
    else:
        sd[f"{base}.weight_g"] = sd.pop(f"{base}.parametrizations.weight.original0")
        sd[f"{base}.weight_v"] = sd.pop(f"{base}.parametrizations.weight.original1")
    converted, unused = convert_wav2vec2(sd)
    assert not unused, unused[:8]
    assert "pos_conv" in converted


@pytest.mark.parametrize("include_encoder", [True, False])
def test_audio2mesh_fullsize_bijection(include_encoder):
    """audio2mesh.pt both ways the reference can ship it: with the wav2vec2
    encoder embedded, or heads-only (encoder loaded from the wav2vec2 dir,
    from_pretrained=True in inference_audio.yaml)."""
    from aniportrait_tpu.audio.audio2mesh import Audio2MeshModel
    from aniportrait_tpu.weights.convert import convert_audio2mesh

    sd = zeros_sd(kg.audio2mesh_keys(include_encoder))
    params, unused = convert_audio2mesh(sd)
    assert not unused, unused[:8]
    model = Audio2MeshModel()
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16000)), 30),
        jax.random.PRNGKey(0),
    )["params"]
    if not include_encoder:
        tree = {k: v for k, v in tree.items() if k != "audio_encoder"}
        params.pop("audio_encoder", None)
    assert_bijection(params, tree, f"audio2mesh(enc={include_encoder})")


@pytest.mark.parametrize("include_encoder", [True, False])
def test_audio2pose_fullsize_bijection(include_encoder):
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel
    from aniportrait_tpu.weights.convert import convert_audio2pose

    sd = zeros_sd(kg.audio2pose_keys(include_encoder))
    params, unused = convert_audio2pose(sd)
    assert not unused, unused[:8]
    model = Audio2PoseModel()
    tree = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 16000)), 30, jnp.zeros((1,), jnp.int32)
        ),
        jax.random.PRNGKey(0),
    )["params"]
    if not include_encoder:
        tree = {k: v for k, v in tree.items() if k != "audio_encoder"}
        params.pop("audio_encoder", None)
    assert_bijection(params, tree, f"audio2pose(enc={include_encoder})")
