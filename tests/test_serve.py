"""HTTP serving layer (scripts/serve.py) — job queue, multipart parsing,
result download.  Uses injected fake handlers so no models load (the model
path itself is covered by the pipeline/CLI tests)."""

import json
import threading
import time
import urllib.request
import uuid

import numpy as np
import pytest


def _png_bytes():
    import cv2

    img = np.zeros((32, 32, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return bytes(buf)


def _multipart(fields):
    boundary = uuid.uuid4().hex
    out = b""
    for name, value in fields.items():
        out += f"--{boundary}\r\n".encode()
        if isinstance(value, tuple):
            fname, data = value
            out += (
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{fname}"\r\n'
                "Content-Type: application/octet-stream\r\n\r\n"
            ).encode() + data + b"\r\n"
        else:
            out += (
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
                f"{value}\r\n"
            ).encode()
    out += f"--{boundary}--\r\n".encode()
    return out, f"multipart/form-data; boundary={boundary}"


@pytest.fixture()
def server(tmp_path):
    from scripts.serve import build_server

    calls = {}

    def a2v(ref_img_rgb, input_audio, out_dir, headpose_video=None, **kw):
        calls["a2v"] = dict(kw, ref_shape=ref_img_rgb.shape,
                            audio=input_audio, headpose=headpose_video)
        path = f"{out_dir}/result.mp4"
        with open(path, "wb") as f:
            f.write(b"FAKEMP4")
        return path

    def v2v_fail(ref_img_rgb, source_video, out_dir, **kw):
        raise RuntimeError("boom")

    httpd = build_server(
        {"audio2video": a2v, "video2video": v2v_fail},
        host="127.0.0.1", port=0, out_dir=str(tmp_path),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, calls
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, body, ctype):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _wait_job(base, jid, want, timeout=10):
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, data = _get(f"{base}/api/jobs/{jid}")
        job = json.loads(data)
        if job["status"] == want:
            return job
        time.sleep(0.05)
    raise AssertionError(f"job never reached {want}: {job}")


def test_health_and_index(server):
    base, _ = server
    code, data = _get(f"{base}/healthz")
    assert code == 200 and json.loads(data)["ok"]
    code, data = _get(base + "/")
    assert code == 200 and b"AniPortrait-TPU" in data


def test_audio2video_roundtrip(server):
    base, calls = server
    body, ctype = _multipart({
        "ref_image": ("ref.png", _png_bytes()),
        "audio": ("a.wav", b"RIFFxxxxWAVE"),
        "size": "64", "steps": "2", "length": "4", "seed": "7",
    })
    code, data = _post(f"{base}/api/audio2video", body, ctype)
    assert code == 202
    jid = json.loads(data)["id"]
    job = _wait_job(base, jid, "done")
    assert job["result"].startswith("/results/")
    code, data = _get(base + job["result"])
    assert code == 200 and data == b"FAKEMP4"
    assert calls["a2v"]["size"] == 64 and calls["a2v"]["steps"] == 2
    assert calls["a2v"]["seed"] == 7 and calls["a2v"]["ref_shape"] == (32, 32, 3)
    assert calls["a2v"]["audio"].endswith(".wav")


def test_failed_job_surfaces_error(server):
    base, _ = server
    body, ctype = _multipart({
        "ref_image": ("ref.png", _png_bytes()),
        "source_video": ("v.mp4", b"\x00\x01"),
    })
    code, data = _post(f"{base}/api/video2video", body, ctype)
    assert code == 202
    jid = json.loads(data)["id"]
    job = _wait_job(base, jid, "failed")
    assert "boom" in job["error"]


def test_bad_request(server):
    base, _ = server
    body, ctype = _multipart({"size": "64"})  # missing files
    code, data = _post(f"{base}/api/audio2video", body, ctype)
    assert code == 400
    code, _ = _get(f"{base}/api/jobs")  # still serving
    assert code == 200


@pytest.mark.slow
def test_serve_end_to_end_micro(tmp_path):
    """Full serving round trip: multipart upload -> job queue ->
    serving_core.run_audio2video (real landmark front-end, tiny audio
    models, micro diffusion pipeline) -> mp4 result download."""
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("tensorflow")
    import jax
    import jax.numpy as jnp
    import scipy.io.wavfile

    from aniportrait_tpu.factory import build_model_defs, init_random_params
    from aniportrait_tpu.audio.audio2mesh import Audio2MeshModel
    from aniportrait_tpu.audio.audio2pose import Audio2PoseModel
    from aniportrait_tpu.pipelines.pose2vid import Pose2VideoPipeline
    from scripts.serve import build_server, model_handlers
    from scripts.serving_core import ServingModels

    tiny_w2v = dict(
        hidden=32, layers=2, heads=4, intermediate=64,
        pos_conv_kernel=16, pos_conv_groups=4,
        conv_layers=((16, 10, 5), (16, 3, 2)),
    )
    a2m = Audio2MeshModel(out_dim=1404, latent_dim=16, **tiny_w2v)
    wav0 = jnp.zeros((1, 3200), jnp.float32)
    a2m_params = jax.jit(lambda k: a2m.init(k, wav0, 8))(
        jax.random.PRNGKey(0)
    )["params"]
    p2p = dict(tiny_w2v)
    p2p["enc_layers"] = p2p.pop("layers")
    p2p["enc_heads"] = p2p.pop("heads")
    a2p = Audio2PoseModel(out_dim=6, latent_dim=16, num_layers=1, heads=2, **p2p)
    a2p_params = jax.jit(
        lambda k: a2p.init(k, wav0, 8, jnp.asarray([3]))
    )(jax.random.PRNGKey(0))["params"]

    defs = build_model_defs(size="micro", use_motion_module=True)
    pipe = Pose2VideoPipeline(init_random_params(defs), window_batch=1)
    models = ServingModels(
        pipe=pipe, a2m=a2m, a2m_params=a2m_params, a2p=a2p, a2p_params=a2p_params
    )

    httpd = build_server(
        model_handlers(models), host="127.0.0.1", port=0, out_dir=str(tmp_path)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        ref = cv2.imread("/root/reference/configs/inference/ref_images/solo.png")
        ok, ref_png = cv2.imencode(".png", ref)
        assert ok
        sr = 16000
        tt = np.arange(sr) / sr
        wav = (0.2 * np.sin(2 * np.pi * 220 * tt) * 32767).astype(np.int16)
        import io as _io

        buf = _io.BytesIO()
        scipy.io.wavfile.write(buf, sr, wav)

        body, ctype = _multipart({
            "ref_image": ("solo.png", bytes(ref_png)),
            "audio": ("tone.wav", buf.getvalue()),
            "size": "64", "steps": "2", "length": "4", "seed": "1",
        })
        code, data = _post(f"{base}/api/audio2video", body, ctype)
        assert code == 202
        jid = json.loads(data)["id"]
        job = _wait_job(base, jid, "done", timeout=900)
        code, mp4 = _get(base + job["result"])
        assert code == 200 and len(mp4) > 200
    finally:
        httpd.shutdown()


def test_concurrent_requests_serialized(tmp_path):
    """Two simultaneous requests must not interleave on the accelerator
    (VERDICT r3 item 8): the single worker owns the device, so handler
    executions are strictly sequential even when POSTs race."""
    from scripts.serve import build_server

    active = []
    overlaps = []
    lock = threading.Lock()

    def a2v(ref_img_rgb, input_audio, out_dir, headpose_video=None, **kw):
        with lock:
            if active:
                overlaps.append(tuple(active))
            active.append(kw["seed"])
        time.sleep(0.2)  # long enough for the other request to be running
        with lock:
            active.remove(kw["seed"])
        path = f"{out_dir}/r{kw['seed']}.mp4"
        with open(path, "wb") as f:
            f.write(b"FAKE")
        return path

    httpd = build_server(
        {"audio2video": a2v, "video2video": a2v},
        host="127.0.0.1", port=0, out_dir=str(tmp_path),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        jids = []

        def post(seed):
            body, ctype = _multipart({
                "ref_image": ("ref.png", _png_bytes()),
                "audio": ("a.wav", b"RIFFxxxxWAVE"),
                "seed": str(seed),
            })
            code, data = _post(f"{base}/api/audio2video", body, ctype)
            assert code == 202
            jids.append(json.loads(data)["id"])

        threads = [threading.Thread(target=post, args=(s,)) for s in (1, 2, 3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for jid in jids:
            _wait_job(base, jid, "done")
        assert not overlaps, f"handlers interleaved on the device: {overlaps}"
    finally:
        httpd.shutdown()


def test_503_over_capacity(tmp_path):
    """POSTs beyond max_queue get 503 + Retry-After, and the server keeps
    serving reads (graceful degradation, VERDICT r3 item 8)."""
    from scripts.serve import build_server

    release = threading.Event()

    def slow(ref_img_rgb, input_audio, out_dir, headpose_video=None, **kw):
        release.wait(10)
        path = f"{out_dir}/r.mp4"
        with open(path, "wb") as f:
            f.write(b"FAKE")
        return path

    httpd = build_server(
        {"audio2video": slow, "video2video": slow},
        host="127.0.0.1", port=0, out_dir=str(tmp_path), max_queue=1,
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        body, ctype = _multipart({
            "ref_image": ("ref.png", _png_bytes()),
            "audio": ("a.wav", b"RIFFxxxxWAVE"),
        })
        codes = []
        # first fills the worker (or queue), second fills the queue,
        # third must be refused: qsize >= 1 once two are outstanding
        for _ in range(4):
            code, data = _post(f"{base}/api/audio2video", body, ctype)
            codes.append(code)
        assert 503 in codes, codes
        assert codes[0] == 202  # first one accepted
        body503 = json.loads(data) if codes[-1] == 503 else None
        if body503:
            assert "capacity" in body503["error"]
        code, _ = _get(f"{base}/healthz")  # reads still served
        assert code == 200
    finally:
        release.set()
        httpd.shutdown()
