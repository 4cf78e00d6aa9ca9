"""ctypes bridge to the native C++ scene renderer (native/renderer.cc).

Builds the shared library on first use with g++ (cached next to the source;
no pybind11 in this environment, hence the plain C ABI + ctypes). Falls back
silently to the NumPy renderer when a toolchain is unavailable — call
is_available() to check.

The world layout (rect geometry/colors/classes, camera offsets) is computed
in Python with the same seeded numpy RNG as the pure-NumPy path, so both
backends render identical geometry; only the sensor-noise samples differ
(xoshiro128+ vs numpy PCG64). Each backend is individually deterministic.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "renderer.cc")
_LIB = os.path.join(os.path.dirname(_SRC), "librenderer.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without -march=native / openmp (portability)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


# Subprocess smoke call (see _native_loader): one 4x4 render of a single
# rect for 2 robots exercises the real entry point end-to-end.
_SMOKE = """
import sys, ctypes
import numpy as np
lib = ctypes.CDLL(sys.argv[1])
lib.render_scene.restype = None
vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
N, H, W, K = 2, 4, 4, 1
f32 = lambda *v: np.array(v, np.float32)
img = np.zeros(N * H * W * 3, np.float32)
dep = np.zeros(N * H * W, np.float32)
seg = np.zeros(N * H * W, np.int32)
lib.render_scene(N, H, W, K, vp(f32(5.0)), vp(f32(2.0)), vp(f32(2.0)),
                 vp(f32(2.0)), vp(f32(2.0)), vp(f32(1.0, 1.0, 1.0)),
                 vp(np.array([1], np.int32)), vp(np.zeros(N, np.float32)),
                 ctypes.c_float(4.0), ctypes.c_float(10.0),
                 ctypes.c_uint64(1), ctypes.c_float(0.0),
                 vp(img), vp(dep), vp(seg))
assert np.isfinite(dep).all() and dep.max() > 0, float(dep.max())
"""


def _load():
    from mrp_gnn_tpu.data._native_loader import load_verified
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        lib = load_verified(_LIB, _SRC, _build, _SMOKE)
        if lib is None:
            _failed = True
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.render_scene.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, f32p, f32p, f32p, i32p, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_uint64, ctypes.c_float,
            f32p, f32p, i32p,
        ]
        lib.render_scene.restype = None
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def render_scene_native(spec, seed: int, scene_index: int) -> dict | None:
    """Native-renderer equivalent of data.synthetic.generate_scene.

    Returns None when the library can't be built/loaded.
    """
    lib = _load()
    if lib is None:
        return None
    rng = np.random.default_rng(np.random.SeedSequence([seed, scene_index]))
    H, W = spec.image_size
    N, K = spec.num_robots, spec.num_rects

    # identical draw order to synthetic.generate_scene => identical world
    depths = np.sort(rng.uniform(spec.min_depth, spec.max_depth, K)
                     )[::-1].astype(np.float32).copy()
    cx = (rng.uniform(0.1, 0.9, K) * W).astype(np.float32)
    cy = (rng.uniform(0.1, 0.9, K) * H).astype(np.float32)
    rw = (rng.uniform(0.12, 0.35, K) * W).astype(np.float32)
    rh = (rng.uniform(0.12, 0.35, K) * H).astype(np.float32)
    colors = rng.uniform(0.15, 1.0, (K, 3)).astype(np.float32)
    classes = rng.integers(1, spec.num_classes, K).astype(np.int32)
    from mrp_gnn_tpu.data.synthetic import camera_offsets
    offsets = camera_offsets(spec, rng).astype(np.float32)

    images = np.empty((N, H, W, 3), np.float32)
    depth = np.empty((N, H, W), np.float32)
    seg = np.empty((N, H, W), np.int32)
    lib.render_scene(
        N, H, W, K, depths, cx, cy, rw, rh,
        np.ascontiguousarray(colors), classes, offsets,
        ctypes.c_float(spec.focal), ctypes.c_float(spec.background_depth),
        ctypes.c_uint64((seed * 1000003 + scene_index) & 0xFFFFFFFFFFFFFFFF),
        ctypes.c_float(0.02),
        images, depth, seg)
    return {"images": images, "depth": depth, "seg": seg,
            "positions": offsets}
