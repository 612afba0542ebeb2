"""In-repo C++ TFLite runner vs tf.lite (XNNPACK) on the real model files."""

import zipfile

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

TASK = "/root/repo/third_party/mp_models/face_landmarker_v2_with_blendshapes.task"


def _tflite_outputs(content, x):
    it = tf.lite.Interpreter(model_content=content)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"], x)
    it.invoke()
    return [it.get_tensor(o["index"]).reshape(-1) for o in it.get_output_details()]


@pytest.mark.parametrize(
    "name,shape",
    [
        ("face_detector.tflite", (1, 128, 128, 3)),
        ("face_blendshapes.tflite", (1, 146, 2)),
        ("face_landmarks_detector.tflite", (1, 256, 256, 3)),
    ],
)
def test_native_matches_tflite(name, shape):
    from aniportrait_tpu.landmark.native import NativeInterpreter

    with zipfile.ZipFile(TASK) as z:
        content = z.read(name)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    nat = NativeInterpreter(content).run(x)
    ref = _tflite_outputs(content, x)
    assert len(nat) == len(ref)
    for a, b in zip(nat, ref):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)


def test_native_end_to_end_landmarks():
    """Full landmark pipeline on the native engine agrees with tf.lite."""
    cv2 = pytest.importorskip("cv2")
    from aniportrait_tpu.landmark import FaceLandmarkerLite

    img = cv2.imread("/root/reference/configs/inference/ref_images/lyl.png")
    res_t = FaceLandmarkerLite(TASK, engine="tflite")(img)
    res_n = FaceLandmarkerLite(TASK, engine="native")(img)
    assert res_n is not None
    np.testing.assert_allclose(res_n["lmks"], res_t["lmks"], atol=2e-3)
    np.testing.assert_allclose(res_n["trans_mat"], res_t["trans_mat"], atol=2e-2)
