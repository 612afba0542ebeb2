"""Quality-gate harness tests (VERDICT r1 next-round #8): PSNR/SSIM
properties + LPIPS math parity against a torch oracle with random weights
(the pretrained LPIPS weights are not in this image; the harness loads them
via convert_lpips_weights when available)."""

import numpy as np
import pytest

from aniportrait_tpu.utils.quality import LPIPS, compare_videos, psnr, ssim


def test_psnr_ssim_properties():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (64, 64, 3), np.uint8)
    assert psnr(img, img) == float("inf")
    assert ssim(img.astype(np.float64), img.astype(np.float64)) == pytest.approx(1.0)

    noisy = np.clip(
        img.astype(np.float64) + rs.randn(64, 64, 3) * 10, 0, 255
    )
    p = psnr(img, noisy)
    assert 25 < p < 32  # sigma=10 noise => PSNR ~28 dB
    s = ssim(img.astype(np.float64), noisy)
    assert 0.3 < s < 0.999

    # monotonic: more noise, lower scores
    noisier = np.clip(img.astype(np.float64) + rs.randn(64, 64, 3) * 30, 0, 255)
    assert psnr(img, noisier) < p
    assert ssim(img.astype(np.float64), noisier) < s


def _rand_lpips_weights(seed=0):
    from aniportrait_tpu.utils.quality import _ALEX_CONVS

    rs = np.random.RandomState(seed)
    w = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX_CONVS):
        w[f"conv{i}_w"] = rs.randn(k, k, cin, cout).astype(np.float32) * 0.05
        w[f"conv{i}_b"] = rs.randn(cout).astype(np.float32) * 0.05
        w[f"lin{i}"] = rs.rand(cout).astype(np.float32)
        cin = cout
    return w


def test_lpips_math_vs_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from aniportrait_tpu.utils.quality import _ALEX_CONVS, _SCALE, _SHIFT

    w = _rand_lpips_weights()
    metric = LPIPS(w)

    rs = np.random.RandomState(1)
    a = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    b = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    def feats_torch(x):
        x = (x - torch.tensor(_SHIFT)) / torch.tensor(_SCALE)
        x = x.permute(0, 3, 1, 2)
        out = []
        for i, (_, _, s, p) in enumerate(_ALEX_CONVS):
            wt = torch.tensor(w[f"conv{i}_w"]).permute(3, 2, 0, 1)
            x = F.conv2d(x, wt, torch.tensor(w[f"conv{i}_b"]), stride=s, padding=p)
            x = F.relu(x)
            out.append(x)
            if i < 2:
                x = F.max_pool2d(x, 3, 2)
        return out

    with torch.no_grad():
        fa = feats_torch(torch.from_numpy(a))
        fb = feats_torch(torch.from_numpy(b))
        total = torch.zeros(2)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / torch.sqrt((xa**2).sum(1, keepdim=True) + 1e-10)
            nb = xb / torch.sqrt((xb**2).sum(1, keepdim=True) + 1e-10)
            d = (na - nb) ** 2 * torch.tensor(w[f"lin{i}"])[None, :, None, None]
            total += d.sum(1).mean((1, 2))

    got = metric(a, b)
    np.testing.assert_allclose(got, total.numpy(), atol=2e-4, rtol=1e-3)

    # sanity: identical inputs -> 0
    np.testing.assert_allclose(metric(a, a), np.zeros(2), atol=1e-6)


def test_lpips_missing_weights_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="convert_lpips_weights"):
        LPIPS(str(tmp_path / "nope.npz"))


def test_compare_videos_and_gate_cli(tmp_path):
    rs = np.random.RandomState(2)
    vid = rs.randint(0, 255, (3, 32, 32, 3), np.uint8)
    noisy = np.clip(vid.astype(np.int32) + rs.randint(-5, 6, vid.shape), 0, 255).astype(
        np.uint8
    )
    rep = compare_videos(vid, noisy)
    assert rep["frames"] == 3 and rep["psnr"] > 30 and "lpips" not in rep

    cv2 = pytest.importorskip("cv2")
    ours_d, ref_d = tmp_path / "ours", tmp_path / "ref"
    ours_d.mkdir(), ref_d.mkdir()
    for i in range(3):
        cv2.imwrite(str(ours_d / f"{i:03d}.png"), vid[i])
        cv2.imwrite(str(ref_d / f"{i:03d}.png"), noisy[i])
    from scripts.quality_gate import main

    assert main([str(ours_d), str(ref_d), "--min-psnr", "30"]) == 0
    assert main([str(ours_d), str(ref_d), "--min-psnr", "99"]) == 1


def test_approximation_gate_policy(tmp_path, capsys):
    """The measured gate policy is CODE, not prose (VERDICT r3 item 5):
    k=2/fusion warn with the measured dB; k>=3 refuses without force."""
    from aniportrait_tpu.utils.quality_gate import (
        check_regression,
        enforce_approximation_gate,
        load_gate_table,
    )

    # exact path: silent
    assert enforce_approximation_gate(1, False) == []

    # the shipped measured table exists and has the gated modes
    table = load_gate_table()
    assert any("encoder cache k=2" in m for m in table)
    assert any("window fusion" in m for m in table)

    w = enforce_approximation_gate(2, False)
    assert len(w) == 1 and "37" in w[0]  # measured ~37.2 dB printed
    w = enforce_approximation_gate(1, True)
    assert len(w) == 1 and "48" in w[0]  # measured ~48.1 dB printed

    with pytest.raises(ValueError, match="force_approx"):
        enforce_approximation_gate(3, False)
    w = enforce_approximation_gate(3, False, force=True)
    assert len(w) == 1 and "FORCED" in w[0]

    # missing table directory: still warns, still refuses k>=3
    empty = str(tmp_path)
    w = enforce_approximation_gate(2, True, table_dir=empty)
    assert len(w) == 2
    with pytest.raises(ValueError):
        enforce_approximation_gate(3, False, table_dir=empty)

    # regression checker: same numbers pass, a 2 dB drop fails
    fresh = [dict(r) for r in table.values() if r.get("psnr")]
    assert check_regression(fresh) == []
    fresh[0]["psnr"] -= 2.0
    problems = check_regression(fresh)
    assert len(problems) == 1 and "PSNR regressed" in problems[0]
