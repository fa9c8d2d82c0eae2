"""ctypes bindings for the native runtime library (native/*.cpp).

The native layer mirrors the reference's C++ runtime split: image IO
(bitmap.cpp), acceleration-structure building (kdtree.h / Embree), and mesh
loading (obj.cpp) run as compiled code on the host, while all device compute
stays in JAX/XLA.  Every entry point has a pure-Python fallback, so the
framework works without the .so (callers check `available()`).

Rebuild with: make -C native
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "liblrt.so")
_lib: Optional[ctypes.CDLL] = None


_BUILD_TRIED = False


def _try_build() -> None:
    """Build liblrt.so on first import if the checkout is fresh.

    The .so is a build artifact (not committed); a fresh clone would
    otherwise silently fall back to the pure-Python paths, which lack
    e.g. PIZ-compressed EXR support (reference scene envmaps use PIZ).

    Concurrency-safe: pytest runs -n 4 xdist workers, so several fresh
    processes can race here — an exclusive flock serializes the build,
    and the Makefile links to a temp name moved into place atomically
    (native/Makefile), so a sibling never dlopens a half-linked .so.
    """
    global _BUILD_TRIED
    if _BUILD_TRIED:
        return
    _BUILD_TRIED = True
    src = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                       "native")
    if not os.path.isdir(src):
        return
    import fcntl
    import subprocess
    lock_path = os.path.join(os.path.dirname(__file__), ".build.lock")
    try:
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if os.path.exists(_LIB_PATH):   # a sibling built it
                    return
                r = subprocess.run(["make", "-C", src], capture_output=True,
                                   timeout=300, check=False)
                if r.returncode != 0:
                    import warnings
                    warnings.warn(
                        "native build failed (pure-Python fallbacks in "
                        "use; PIZ EXR unsupported):\n"
                        + r.stderr.decode(errors="replace")[-2000:])
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load():
    global _lib
    if _lib is None and not os.path.exists(_LIB_PATH):
        _try_build()
    if _lib is None and os.path.exists(_LIB_PATH):
        try:                       # AttributeError: stale .so missing a
            lib = ctypes.CDLL(_LIB_PATH)  # symbol added since it was built
            lib.lrt_exr_error.restype = ctypes.c_char_p
            lib.lrt_exr_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.lrt_exr_channel_name.argtypes = [
                ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
            lib.lrt_exr_read.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_longlong]
            lib.lrt_exr_write.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.lrt_bvh_build.argtypes = [
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_longlong,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong]
            lib.lrt_obj_load.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.lrt_obj_fetch.argtypes = [
                ctypes.c_longlong,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except (OSError, AttributeError):
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def exr_read(path: str):
    """Read any scanline EXR -> (img HxWxC float32, channel names)."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.lrt_exr_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)) != 0:
        raise IOError(f"EXR probe failed for {path}: "
                      f"{lib.lrt_exr_error().decode()}")
    names = []
    buf = ctypes.create_string_buffer(256)
    for i in range(c.value):
        lib.lrt_exr_channel_name(i, buf, 256)
        names.append(buf.value.decode())
    out = np.empty((h.value, w.value, c.value), np.float32)
    if lib.lrt_exr_read(path.encode(), out, out.size) != 0:
        raise IOError(f"EXR read failed for {path}: "
                      f"{lib.lrt_exr_error().decode()}")
    return out, names


def exr_write(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {c}")
    if lib.lrt_exr_write(path.encode(), img, w, h, c) != 0:
        raise IOError(f"EXR write failed for {path}: "
                      f"{lib.lrt_exr_error().decode()}")


def bvh_build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Native binned-SAH build; returns the accel.bvh.BVHArrays fields."""
    lib = _load()
    T = len(v0)
    cap = max(2 * T, 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    right = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    perm = np.empty(max(T, 1), np.int32)
    n_nodes = ctypes.c_longlong()
    depth = ctypes.c_int32()
    rc = lib.lrt_bvh_build(
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(v1, np.float32),
        np.ascontiguousarray(v2, np.float32), T,
        node_min, node_max, right, first, count, perm,
        ctypes.byref(n_nodes), ctypes.byref(depth), cap)
    if rc != 0:
        raise RuntimeError("native BVH build failed")
    n = n_nodes.value
    return (node_min[:n].copy(), node_max[:n].copy(), right[:n].copy(),
            first[:n].copy(), count[:n].copy(), perm[:T].copy(), depth.value)


def obj_load(path: str):
    """Native OBJ parse -> (verts, faces, normals|None, uvs|None)."""
    lib = _load()
    handle = ctypes.c_longlong()
    nv = ctypes.c_longlong()
    nt = ctypes.c_longlong()
    has_uv = ctypes.c_int32()
    has_n = ctypes.c_int32()
    if lib.lrt_obj_load(path.encode(), ctypes.byref(handle),
                        ctypes.byref(nv), ctypes.byref(nt),
                        ctypes.byref(has_uv), ctypes.byref(has_n)) != 0:
        raise IOError(f"OBJ load failed: {path}")
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nt.value, 3), np.int32)
    normals = np.empty((nv.value, 3), np.float32) if has_n.value else None
    uvs = np.empty((nv.value, 2), np.float32) if has_uv.value else None
    lib.lrt_obj_fetch(
        handle.value, verts, faces,
        normals.ctypes.data if normals is not None else None,
        uvs.ctypes.data if uvs is not None else None)
    return verts, faces, normals, uvs
