"""Native C++ runtime components (BVH build, OBJ parsing), bound via
ctypes with graceful Python fallback.

The reference keeps its scene-build runtime in C++ (embree BVH build,
src/core/bvh/BvhBuilder.cpp, src/core/io/ObjLoader.cpp); the TPU
framework keeps the *compute* path in XLA/Pallas but the host-side
scene-build runtime is native too.  The library auto-builds with g++ on
first use (`-O3 -march=native -shared -fPIC`) and is cached next to the
sources; set TUNGSTEN_TPU_NO_NATIVE=1 to force the Python fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtungsten_rt.so")
_SOURCES = ["bvh_builder.cpp", "objloader.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest:
        return True
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", _LIB_PATH] + srcs
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            sys.stderr.write("tungsten_tpu native build failed:\n"
                             + res.stderr.decode()[:2000] + "\n")
            return False
        return True
    except Exception as e:  # g++ missing etc.
        sys.stderr.write(f"tungsten_tpu native build skipped: {e}\n")
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TUNGSTEN_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.trt_build_bvh.argtypes = [f32p, f32p, ctypes.c_int,
                                      ctypes.c_int, f32p, f32p, i32p,
                                      i32p, i32p]
        lib.trt_build_bvh.restype = ctypes.c_int
        lib.trt_load_obj.argtypes = [ctypes.c_char_p, i64p, i64p]
        lib.trt_load_obj.restype = ctypes.c_int
        lib.trt_obj_fetch.argtypes = [f32p, f32p, f32p, i32p]
        lib.trt_obj_fetch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_bvh_native(prim_min: np.ndarray, prim_max: np.ndarray,
                     max_leaf: int = 4):
    """Native binned-SAH build; returns (bounds_min, bounds_max, meta,
    skip, order) or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = int(prim_min.shape[0])
    if n == 0:
        return None
    pmin = np.ascontiguousarray(prim_min, np.float32)
    pmax = np.ascontiguousarray(prim_max, np.float32)
    cap = 2 * n
    out_min = np.empty((cap, 3), np.float32)
    out_max = np.empty((cap, 3), np.float32)
    out_meta = np.empty((cap, 2), np.int32)
    out_skip = np.empty(cap, np.int32)
    out_order = np.empty(n, np.int32)
    num = lib.trt_build_bvh(pmin, pmax, n, max_leaf, out_min, out_max,
                            out_meta, out_skip, out_order)
    if num <= 0:
        return None
    return (out_min[:num].copy(), out_max[:num].copy(),
            out_meta[:num].copy(), out_skip[:num].copy(), out_order)


def load_obj_native(path: str):
    """Native OBJ parse; returns (pos, normal, uv, indices) or None."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    if lib.trt_load_obj(path.encode(), ctypes.byref(nv),
                        ctypes.byref(nt)) != 0:
        return None
    nv, nt = nv.value, nt.value
    if nv == 0 or nt == 0:
        return None
    pos = np.empty((nv, 3), np.float32)
    nrm = np.empty((nv, 3), np.float32)
    uv = np.empty((nv, 2), np.float32)
    idx = np.empty((nt, 3), np.int32)
    if lib.trt_obj_fetch(pos, nrm, uv, idx) != 0:
        return None
    return pos, nrm, uv, idx
