"""ctypes binding for the in-repo C++ TFLite runner
(native/tflite_runner/).  Drop-in ``InterpreterLike`` for
``FaceLandmarkerLite`` — builds the shared library on first use."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "tflite_runner")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtflite_runner.so")


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.flr_create.restype = ctypes.c_void_p
    lib.flr_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.flr_destroy.argtypes = [ctypes.c_void_p]
    for f in ("flr_num_inputs", "flr_num_outputs"):
        getattr(lib, f).argtypes = [ctypes.c_void_p]
        getattr(lib, f).restype = ctypes.c_int
    for f in ("flr_input_size", "flr_output_size"):
        getattr(lib, f).argtypes = [ctypes.c_void_p, ctypes.c_int]
        getattr(lib, f).restype = ctypes.c_int
    lib.flr_set_input.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int,
    ]
    lib.flr_invoke.argtypes = [ctypes.c_void_p]
    lib.flr_get_output.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_int,
    ]
    return lib


_LIB = None


class NativeInterpreter:
    """Runs a .tflite model through the in-repo C++ interpreter."""

    def __init__(self, model_content: bytes):
        global _LIB
        if _LIB is None:
            _LIB = _load_lib()
        self._buf = model_content  # keep alive
        self._h = _LIB.flr_create(model_content, len(model_content))
        if not self._h:
            raise RuntimeError("failed to load model in native runner")

    def __del__(self):
        if getattr(self, "_h", None) and _LIB is not None:
            _LIB.flr_destroy(self._h)
            self._h = None

    def run(self, inputs: np.ndarray) -> List[np.ndarray]:
        x = np.ascontiguousarray(inputs, np.float32).reshape(-1)
        assert x.size == _LIB.flr_input_size(self._h, 0)
        _LIB.flr_set_input(self._h, 0, x, x.size)
        _LIB.flr_invoke(self._h)
        outs = []
        for i in range(_LIB.flr_num_outputs(self._h)):
            n = _LIB.flr_output_size(self._h, i)
            buf = np.empty(n, np.float32)
            _LIB.flr_get_output(self._h, i, buf, n)
            outs.append(buf)
        return outs
