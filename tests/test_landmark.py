"""Landmark front-end tests: TFLite pipeline on the reference demo images +
geometry solver self-consistency + rasterizer."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_IMAGES = "/root/reference/configs/inference/ref_images"
TASK = "/root/repo/third_party/mp_models/face_landmarker_v2_with_blendshapes.task"


@pytest.fixture(scope="module")
def landmarker():
    pytest.importorskip("tensorflow")
    from aniportrait_tpu.landmark import FaceLandmarkerLite

    return FaceLandmarkerLite(TASK)


@pytest.mark.parametrize("name", ["lyl.png", "solo.png", "Aragaki.png"])
def test_detect_reference_images(landmarker, name):
    img = cv2.imread(f"{REF_IMAGES}/{name}")
    res = landmarker(img)
    assert res is not None, f"no face found in {name}"
    lm = res["lmks"]
    assert lm.shape == (478, 3)
    assert 0.0 < lm[:, 0].min() and lm[:, 0].max() < 1.0
    assert 0.0 < lm[:, 1].min() and lm[:, 1].max() < 1.0
    assert len(res["bs"]) == 51
    assert res["lmks3d"].shape == (468, 3)

    # geometry contract: projecting trans_mat @ lmks3d through the
    # reference's 63-deg perspective matrix reproduces the 2D landmarks
    from aniportrait_tpu.utils.pose_util import project_points_with_trans

    H, W = img.shape[:2]
    proj = project_points_with_trans(
        res["lmks3d"][None], res["trans_mat"][None], [H, W]
    )[0]
    px = np.stack([lm[:468, 0] * W, lm[:468, 1] * H], axis=1)
    assert np.abs(proj - px).mean() < 0.5

    # rigid pose matrix
    R = res["trans_mat"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_pose_rasterizer(landmarker):
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer

    img = cv2.imread(f"{REF_IMAGES}/lyl.png")
    res = landmarker(img)
    vis = FaceMeshVisualizer(forehead_edge=False)
    pose_img = vis.draw_landmarks((512, 512), res["lmks"].astype(np.float32), normed=True)
    assert pose_img.shape == (512, 512, 3)
    assert pose_img.dtype == np.uint8
    # edges drawn: nontrivial number of colored pixels, many distinct colors
    nonzero = (pose_img.sum(-1) > 0).sum()
    assert nonzero > 2000
    colors = set(map(tuple, pose_img[pose_img.sum(-1) > 0][:5000]))
    assert len(colors) >= 8  # head + eyes + brows + 8 lip segments


def test_geometry_solver_recovers_known_pose(landmarker):
    """Synthesize screen landmarks by projecting the canonical mesh with a
    known pose; the solver must recover it."""
    from aniportrait_tpu.landmark.geometry import GeometrySolver
    from aniportrait_tpu.utils.pose_util import (
        euler_and_translation_to_matrix,
        project_points_with_trans,
    )

    solver = landmarker.solver
    canonical = solver.canonical
    true_mat = euler_and_translation_to_matrix([10.0, -15.0, 5.0], [1.0, -2.0, -45.0])
    W = H = 512
    proj = project_points_with_trans(canonical[None], true_mat[None], [H, W])[0]
    lm = np.zeros((478, 3), np.float32)
    lm[:468, 0] = proj[:, 0] / W
    lm[:468, 1] = proj[:, 1] / H
    # relative z from camera-space depth, x-like normalisation
    cam = (np.concatenate([canonical, np.ones((468, 1))], 1) @ true_mat.T)[:, :3]
    zrel = (cam[:, 2] - cam[:, 2].mean()) / (2 * 45.0 / (1.0 / np.tan(np.radians(31.5))))
    lm[:468, 2] = -zrel / 2

    res = solver.solve(lm, (W, H))
    reproj = project_points_with_trans(res["mesh"][None], res["trans_mat"][None], [H, W])[0]
    assert np.abs(reproj - proj).mean() < 1.0
    # rotation approximately recovered (the synthetic relative-z encoding is
    # only an approximation of the landmark model's z cue; the binding
    # contract downstream is the reprojection above)
    R_err = res["trans_mat"][:3, :3] @ true_mat[:3, :3].T
    angle = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert angle < 15.0


def test_blendshape_subset_parsed_from_bundle():
    """The 146-landmark selection is read out of face_blendshapes.tflite
    itself (provenance-exact), not a reconstructed list."""
    import zipfile

    from aniportrait_tpu.landmark.pipeline import (
        BLENDSHAPE_SUBSET,
        blendshape_subset_from_task,
    )

    with zipfile.ZipFile(TASK) as z:
        subset = blendshape_subset_from_task(z.read("face_blendshapes.tflite"))
    assert len(subset) == 146
    assert subset == sorted(subset)
    assert subset[0] == 0 and subset[-1] == 477
    # the two spots where the pre-parse reconstruction was wrong
    assert 308 in subset and 467 not in subset
    # fallback constant matches the shipped bundle's embedded tensor
    assert subset == BLENDSHAPE_SUBSET


def test_lmk_extractor_native_fallback(monkeypatch):
    """LMKExtractor('auto') must resolve to the in-repo C++ engine when
    neither mediapipe nor tensorflow imports (VERDICT r1 next-round #7)."""
    import builtins

    from aniportrait_tpu.utils.mp_utils import LMKExtractor

    real_import = builtins.__import__

    def no_tf(name, *a, **k):
        if name in ("mediapipe", "tensorflow"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tf)
    ext = LMKExtractor(backend="auto", task_path=TASK)
    img = cv2.imread(f"{REF_IMAGES}/lyl.png")
    res = ext(img)
    assert res is not None
    assert res["lmks"].shape == (478, 3)
    assert res["lmks3d"].shape == (468, 3)
    assert len(res["bs"]) == 51
