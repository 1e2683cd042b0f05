"""Native (C++) host-side components, loaded via ctypes.

Build-on-first-use: the shared library is compiled with g++ into this
directory and cached; every native entry point has a pure-numpy fallback so
the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "libyartnative.so")
_SOURCES = ["bvh_builder.cpp", "bvh8_collapse.cpp"]

_lib = None
_lib_tried = False


def _build_library() -> Optional[str]:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= newest_src:
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO_PATH, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception:
        return None


def get_library() -> Optional[ctypes.CDLL]:
    """The native library, or None if unavailable."""
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        path = _build_library()
        if path:
            try:
                lib = ctypes.CDLL(path)
                f32p = ctypes.POINTER(ctypes.c_float)
                i32p = ctypes.POINTER(ctypes.c_int32)
                lib.yart_build_bvh.restype = ctypes.c_int
                lib.yart_build_bvh.argtypes = [
                    f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    f32p, f32p, i32p, i32p, i32p, i32p, i32p,
                ]
                lib.yart_collapse_bvh8.restype = ctypes.c_int
                lib.yart_collapse_bvh8.argtypes = [
                    f32p, f32p, i32p, i32p, ctypes.c_int, ctypes.c_int,
                    f32p, i32p, i32p, i32p,
                ]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


def build_bvh_native(v0, v1, v2, max_leaf: int = 4, n_bins: int = 20):
    """C++ SAH build; returns the same HostBVH tuple as scene.bvh.build_bvh,
    or None if the native library is unavailable."""
    from yart_tpu.scene.bvh import HostBVH

    lib = get_library()
    if lib is None:
        return None

    n = int(v0.shape[0])
    cap = max(1, 2 * n - 1)
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    left = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    order = np.empty(n, np.int32)
    n_nodes = np.zeros(1, np.int32)
    depth = np.zeros(1, np.int32)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.yart_build_bvh(
        p(v0), p(v1), p(v2), n, max_leaf, n_bins,
        p(node_min), p(node_max), pi(left), pi(count), pi(order),
        pi(n_nodes), pi(depth),
    )
    if rc != 0:
        return None
    m = int(n_nodes[0])
    return HostBVH(
        node_min[:m], node_max[:m], left[:m], count[:m], order, int(depth[0])
    )


def collapse_bvh8_native(hb, width: int = 8):
    """C++ BVH8 collapse; returns HostBVH8 or None if unavailable."""
    from yart_tpu.scene.bvh import HostBVH8

    lib = get_library()
    if lib is None or width != 8:
        return None

    n = int(hb.left.shape[0])
    cap = max(1, n)
    node_min = np.ascontiguousarray(hb.node_min, np.float32)
    node_max = np.ascontiguousarray(hb.node_max, np.float32)
    left = np.ascontiguousarray(hb.left, np.int32)
    count = np.ascontiguousarray(hb.count, np.int32)
    boxes = np.empty((cap, 8, 6), np.float32)
    child = np.empty((cap, 8), np.int32)
    out_m = np.zeros(1, np.int32)
    out_d = np.zeros(1, np.int32)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.yart_collapse_bvh8(
        p(node_min), p(node_max), pi(left), pi(count), n, cap,
        p(boxes), pi(child), pi(out_m), pi(out_d),
    )
    if rc != 0:
        return None
    m = int(out_m[0])
    return HostBVH8(boxes[:m].copy(), child[:m].copy(), int(out_d[0]))
