"""Audio stack integration: wav2vec2 -> audio2mesh/audio2pose (tiny configs,
random weights) -> mesh offsets on real landmarks -> projection -> pose maps.
Exercises the full audio2vid conditioning front-end minus diffusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

TINY_W2V = dict(
    hidden=32, layers=2, heads=4, intermediate=64,
    pos_conv_kernel=16, pos_conv_groups=4,
    conv_layers=((16, 10, 5), (16, 3, 2)),
)


def test_audio2mesh_shapes():
    from aniportrait_tpu.audio.audio2mesh import Audio2MeshModel

    model = Audio2MeshModel(out_dim=1404, latent_dim=16, **TINY_W2V)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 3200), jnp.float32)
    params = jax.jit(lambda k: model.init(k, wav, 30))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p, w: model.apply(p, w, 30))(params, wav)
    assert out.shape == (1, 30, 1404)
    # zero-init out_fn => zero offsets at init (reference model.py:34-38)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_audio2pose_autoregressive():
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel

    w2v = dict(TINY_W2V)
    w2v["enc_layers"] = w2v.pop("layers")
    w2v["enc_heads"] = w2v.pop("heads")
    model = Audio2PoseModel(out_dim=6, latent_dim=16, num_layers=2, heads=4, **w2v)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 3200), jnp.float32)
    seq_len = 10
    params = jax.jit(lambda k: model.init(k, wav, seq_len, jnp.asarray([3])))(
        jax.random.PRNGKey(0)
    )
    out = jax.jit(lambda p, w: model.apply(p, w, seq_len, jnp.asarray([3])))(
        params, wav
    )
    assert out.shape == (1, seq_len, 6)
    assert np.isfinite(np.asarray(out)).all()
    # different speaker id gives a different sequence
    out2 = jax.jit(lambda p, w: model.apply(p, w, seq_len, jnp.asarray([7])))(
        params, wav
    )
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_audio2vid_conditioning_front_end():
    """Real landmarks + mesh offsets + pose template -> projected pose maps."""
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("tensorflow")
    from aniportrait_tpu.landmark import FaceLandmarkerLite
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer
    from aniportrait_tpu.utils.pose_util import project_points, smooth_pose_seq

    img = cv2.imread("/root/reference/configs/inference/ref_images/lyl.png")
    res = FaceLandmarkerLite(
        "/root/repo/third_party/mp_models/face_landmarker_v2_with_blendshapes.task"
    )(img)
    assert res is not None

    L = 8
    rs = np.random.RandomState(0)
    offsets = rs.randn(L, 468, 3).astype(np.float32) * 0.05  # cm-scale jitter
    pred = offsets + res["lmks3d"]

    pose_seq = np.zeros((L, 6))
    pose_seq[:, 1] = np.linspace(-10, 10, L)  # pan head
    pose_seq = smooth_pose_seq(pose_seq, 3)

    H, W = img.shape[:2]
    projected = project_points(pred, res["trans_mat"], pose_seq, [H, W])
    assert projected.shape == (L, 468, 2)
    # projections stay roughly in frame
    assert (projected[:, :, 0] > -W).all() and (projected[:, :, 0] < 2 * W).all()

    vis = FaceMeshVisualizer(forehead_edge=False)
    pose_img = vis.draw_landmarks((W, H), projected[0], normed=False)
    assert (pose_img.sum(-1) > 0).sum() > 500


def test_non_wav_decode_ffmpeg(tmp_path):
    """librosa-parity: non-WAV containers decode through ffmpeg."""
    import shutil
    import subprocess

    import numpy as np
    import pytest
    from scipy.io import wavfile

    from aniportrait_tpu.utils.audio_util import load_audio, prepare_audio_feature

    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not installed")
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, sr, (x * 32767).astype(np.int16))
    ogg = str(tmp_path / "a.ogg")
    subprocess.run(["ffmpeg", "-v", "error", "-y", "-i", wav, ogg], check=True)
    a, b = load_audio(wav), load_audio(ogg)
    n = min(len(a), len(b))
    assert np.corrcoef(a[:n], b[:n])[0, 1] > 0.9
    assert prepare_audio_feature(ogg)["seq_len"] == 30


def test_generate_head_pose_batched_chunks_match_sequential():
    """scripts/audio2vid.generate_head_pose batches the equal-length 5-s
    chunks into one apply; the result must equal the reference's sequential
    per-chunk loop (audio2vid.py:188-193) exactly (batching is
    computation-preserving: per-sample norms and attention)."""
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel
    from aniportrait_tpu.utils.pose_util import smooth_pose_seq
    from scripts.audio2vid import generate_head_pose

    w2v = dict(TINY_W2V)
    w2v["enc_layers"] = w2v.pop("layers")
    w2v["enc_heads"] = w2v.pop("heads")
    model = Audio2PoseModel(out_dim=6, latent_dim=16, num_layers=2, heads=4, **w2v)

    # 12 s of audio at 16 kHz / 30 fps -> chunks of 150+150+60 frames, the
    # 60 merged into the second -> one batched head chunk + one tail chunk
    sr, fps = 16000, 30
    secs = 12
    wav = np.random.RandomState(0).randn(sr * secs).astype(np.float32)
    seq_len = secs * fps
    params = jax.jit(lambda k: model.init(k, jnp.asarray(wav[: sr * 5])[None],
                                          150, jnp.asarray([3])))(
        jax.random.PRNGKey(0)
    )["params"]

    got = generate_head_pose(model, params, wav, seq_len, id_seed=3)

    # sequential reference loop
    chunk_size = sr * 5
    chunks = [wav[i : i + chunk_size] for i in range(0, len(wav), chunk_size)]
    sls = [150] * (len(chunks) - 1) + [seq_len % 150]
    chunks[-2] = np.concatenate([chunks[-2], chunks[-1]])
    sls[-2] += sls[-1]
    del chunks[-1], sls[-1]
    parts = []
    for audio, sl in zip(chunks, sls):
        out = np.array(
            model.apply({"params": params}, jnp.asarray(audio)[None], int(sl),
                        jnp.asarray([3]))
        )[0]
        out[:, :3] *= 0.5
        parts.append(out)
    want = smooth_pose_seq(np.concatenate(parts, 0), 7)

    assert got.shape == (seq_len, 6)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
