"""ctypes bindings for the native C++ runtime (`native/libganative.so`).

Provides fast host-side mesh extraction and PLY encoding; every entry point
falls back to the pure-python implementation when the library isn't built
(`make -C native`). This mirrors the reference's split: device compute in
kernels, host runtime (meshing/IO) in C++ (Open3D / plyfile there).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "native", "libganative.so")
    if not os.path.exists(path):
        # Lazy one-shot build: the .so is gitignored, so a fresh checkout
        # would silently take the pure-python surface-nets fallback —
        # measured 67 s vs sub-second native at a 176³ grid in the
        # release cascade. Build into a per-PID temp name + atomic rename
        # so concurrent processes never CDLL a half-written file.
        import shutil
        import subprocess
        import tempfile
        try:
            tmp = tempfile.mkdtemp(prefix="ganative_")
            for src in ("surface_nets.cc", "Makefile"):
                shutil.copy(os.path.join(root, "native", src), tmp)
            subprocess.run(["make", "-C", tmp], check=True,
                           capture_output=True, timeout=120)
            os.replace(os.path.join(tmp, "libganative.so"), path)
            shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            return None
        if not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.ga_surface_nets
        lib.ga_write_ply
    except (OSError, AttributeError):
        return None                       # partial/incompatible .so → fallback
    lib.ga_surface_nets.restype = ctypes.c_int
    lib.ga_surface_nets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ga_write_ply.restype = ctypes.c_int
    lib.ga_write_ply.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    if hasattr(lib, "ga_tsdf_integrate"):
        fp = ctypes.POINTER(ctypes.c_float)
        lib.ga_tsdf_integrate.restype = ctypes.c_int
        lib.ga_tsdf_integrate.argtypes = [
            fp, fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, fp, fp, fp,
        ]
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def have_tsdf_integrate() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ga_tsdf_integrate")


def tsdf_integrate(depths: np.ndarray, colors: np.ndarray,
                   alphas: np.ndarray, cam_view: np.ndarray,
                   tanfov: float, resolution: int = 128,
                   bound: float = 0.495, trunc_voxels: float = 12.0,
                   alpha_thres: float = 0.08
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host C++ OpenMP TSDF fusion (the Open3D-integrate role).

    Same semantics as `render.tsdf.integrate_tsdf` (which stays as the
    pure-JAX path): depths/alphas (V, 1, H, W), colors (V, 3, H, W),
    cam_view (V, 4, 4) row-vector. Returns (tsdf (D,D,D),
    color (D,D,D,3)). On TPU the XLA integrate is gather-bound (~45 s at
    176³/50 views on v5e — 5.4G scalar gathers); the 256 KB per-view
    images sit in host cache and the C++ loop finishes in ~1 s.
    """
    lib = _load()
    assert lib is not None and hasattr(lib, "ga_tsdf_integrate")
    D = resolution
    V, _, H, W = depths.shape
    voxel = 2 * bound / D
    dep = np.ascontiguousarray(depths.reshape(V, H, W), np.float32)
    alp = np.ascontiguousarray(alphas.reshape(V, H, W), np.float32)
    col = np.ascontiguousarray(colors, np.float32)
    cv = np.ascontiguousarray(cam_view, np.float32)
    tsdf = np.empty((D, D, D), np.float32)
    weight = np.empty((D, D, D), np.float32)
    color_out = np.empty((D, D, D, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.ga_tsdf_integrate(
        dep.ctypes.data_as(fp), col.ctypes.data_as(fp),
        alp.ctypes.data_as(fp), cv.ctypes.data_as(fp),
        V, H, W, ctypes.c_float(float(tanfov)), D,
        ctypes.c_float(bound), ctypes.c_float(trunc_voxels * voxel),
        ctypes.c_float(alpha_thres),
        tsdf.ctypes.data_as(fp), weight.ctypes.data_as(fp),
        color_out.ctypes.data_as(fp))
    assert rc == 0
    return tsdf, color_out


def surface_nets(tsdf: np.ndarray, color: Optional[np.ndarray] = None,
                 bound: float = 0.495
                 ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Native surface nets; falls back to `render.tsdf.surface_nets`."""
    lib = _load()
    if lib is None:
        from gaussiananything_tpu.render.tsdf import \
            surface_nets as py_surface_nets
        return py_surface_nets(tsdf, color, bound)

    D = tsdf.shape[0]
    tsdf_c = np.ascontiguousarray(tsdf, np.float32)
    col_c = (np.ascontiguousarray(color, np.float32)
             if color is not None else None)
    vert_cap = max(1024, 4 * D * D * 3)
    fp = ctypes.POINTER(ctypes.c_float)
    for _attempt in range(4):      # grow-and-retry on capacity overflow
        face_cap = 4 * vert_cap
        verts = np.empty((vert_cap, 3), np.float32)
        cols = np.empty((vert_cap, 3), np.float32)
        faces = np.empty((face_cap, 3), np.int32)
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        rc = lib.ga_surface_nets(
            tsdf_c.ctypes.data_as(fp),
            col_c.ctypes.data_as(fp) if col_c is not None else None,
            D, ctypes.c_float(bound),
            verts.ctypes.data_as(fp),
            cols.ctypes.data_as(fp),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vert_cap, face_cap, ctypes.byref(nv), ctypes.byref(nf))
        if rc == 0:
            break
        vert_cap *= 4
    if rc != 0:
        raise RuntimeError("ga_surface_nets: capacity exceeded")
    v = verts[: nv.value].copy()
    f = faces[: nf.value].copy()
    c = cols[: nv.value].copy() if color is not None else None
    return v, f, c


def write_ply_native(path: str, fields: dict) -> bool:
    """Native binary PLY writer; returns False (caller should fall back)
    when the library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    names = list(fields)
    n = len(fields[names[0]])
    data = np.ascontiguousarray(
        np.stack([np.asarray(fields[k], np.float32).reshape(n)
                  for k in names], axis=1))
    blob = b"\0".join(k.encode() for k in names) + b"\0"
    rc = lib.ga_write_ply(
        path.encode(), blob, len(names),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return rc == 0
