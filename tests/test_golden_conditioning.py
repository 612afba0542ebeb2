"""Golden regression: the conditioning front-end (landmarks -> head pose ->
pose-map rasterisation) on the reference demo images must stay stable —
these pose maps ARE the learned conditioning contract (SURVEY §2 #20)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

FIXTURE = "/root/repo/tests/fixtures/landmark_golden.npz"
REF_IMAGES = "/root/reference/configs/inference/ref_images"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def landmarker():
    pytest.importorskip("tensorflow")
    from aniportrait_tpu.landmark import FaceLandmarkerLite

    return FaceLandmarkerLite(
        "/root/repo/third_party/mp_models/face_landmarker_v2_with_blendshapes.task"
    )


@pytest.mark.parametrize("name", ["lyl", "solo", "Aragaki"])
def test_landmarks_and_pose_map_stable(golden, landmarker, name):
    from aniportrait_tpu.utils.draw_util import FaceMeshVisualizer

    img = cv2.imread(f"{REF_IMAGES}/{name}.png")
    res = landmarker(img)
    assert res is not None

    np.testing.assert_allclose(res["lmks"], golden[f"{name}_lmks"], atol=2e-3)
    np.testing.assert_allclose(
        res["trans_mat"], golden[f"{name}_trans_mat"], atol=2e-2
    )

    vis = FaceMeshVisualizer(forehead_edge=False)
    pose = vis.draw_landmarks((512, 512), res["lmks"].astype(np.float32), normed=True)
    ref_pose = golden[f"{name}_pose"]
    # allow a sliver of pixels to move by one raster step
    frac_diff = (pose != ref_pose).mean()
    assert frac_diff < 0.01, f"pose map drifted: {frac_diff:.4f} of pixels differ"
