"""ctypes bindings for the native geometry backend (liblstpu_native.so).

The backend replaces the reference's vendored Cython/C++ kernels
(libmcubes, libsimplify, libkdtree, libmesh) with fresh C++ implementations;
see the .cpp sources for algorithmic notes. The library auto-builds on first
import if g++ is available and the .so is missing/stale.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "liblstpu_native.so")

_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DIR, "-s"], check=True, capture_output=True
    )


def _sources_newer_than_lib() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.join(_DIR, "src")
    return any(
        os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime
        for f in os.listdir(src_dir)
        if f.endswith(".cpp")
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _sources_newer_than_lib():
        _build()
    lib = ctypes.CDLL(_LIB_PATH)

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.isosurface_extract.restype = ctypes.c_void_p
    lib.isosurface_extract.argtypes = [f32p, i64, i64, i64, ctypes.c_float]
    lib.iso_num_vertices.restype = i64
    lib.iso_num_vertices.argtypes = [ctypes.c_void_p]
    lib.iso_num_triangles.restype = i64
    lib.iso_num_triangles.argtypes = [ctypes.c_void_p]
    lib.iso_copy.argtypes = [ctypes.c_void_p, f32p, i64p]
    lib.iso_free.argtypes = [ctypes.c_void_p]

    lib.simplify_mesh.restype = ctypes.c_void_p
    lib.simplify_mesh.argtypes = [f32p, i64, i64p, i64, i64, ctypes.c_double]
    lib.simplify_num_vertices.restype = i64
    lib.simplify_num_vertices.argtypes = [ctypes.c_void_p]
    lib.simplify_num_triangles.restype = i64
    lib.simplify_num_triangles.argtypes = [ctypes.c_void_p]
    lib.simplify_copy.argtypes = [ctypes.c_void_p, f32p, i64p]
    lib.simplify_free.argtypes = [ctypes.c_void_p]

    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [f32p, i64]
    lib.kdtree_query.argtypes = [ctypes.c_void_p, f32p, i64, f32p, i32p]
    lib.kdtree_query_k.argtypes = [
        ctypes.c_void_p, f32p, i64, ctypes.c_int32, f32p, i32p,
    ]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]

    lib.voxelize_mesh.argtypes = [f32p, i64, i64p, i64, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, u8p]

    lib.inside_mesh_build.restype = ctypes.c_void_p
    lib.inside_mesh_build.argtypes = [f32p, i64, i64p, i64, ctypes.c_int]
    lib.inside_mesh_query.argtypes = [ctypes.c_void_p, f32p, i64, u8p]
    lib.inside_mesh_free.argtypes = [ctypes.c_void_p]

    _lib = lib
    return lib


def marching_isosurface(
    values: np.ndarray, isovalue: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface of a dense (nx, ny, nz) scalar grid.

    Returns (verts (V, 3) float32 in grid-index coordinates,
    faces (F, 3) int64).
    """
    lib = get_lib()
    v = np.ascontiguousarray(values, np.float32)
    assert v.ndim == 3
    handle = lib.isosurface_extract(v, *v.shape, float(isovalue))
    try:
        nv = lib.iso_num_vertices(handle)
        nt = lib.iso_num_triangles(handle)
        verts = np.empty((nv, 3), np.float32)
        tris = np.empty((nt, 3), np.int64)
        if nv:
            lib.iso_copy(handle, verts, tris)
        return verts, tris
    finally:
        lib.iso_free(handle)


def simplify_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    target_faces: int,
    aggressiveness: float = 5.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse simplification to ~target_faces.

    aggressiveness follows the reference Fast-Quadric knob's direction
    (higher = more eager bulk collapsing): it sets where the cheap
    quantile-threshold sweeps hand over to the exact greedy heap, at
    (1 + 15/aggressiveness) x target_faces. The default 5.0 is the
    measured-optimal 4x handover; lower values trade speed for the
    order-exact heap's quality on more of the reduction."""
    lib = get_lib()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    handle = lib.simplify_mesh(
        v, len(v), f, len(f), int(target_faces), float(aggressiveness)
    )
    try:
        nv = lib.simplify_num_vertices(handle)
        nt = lib.simplify_num_triangles(handle)
        out_v = np.empty((nv, 3), np.float32)
        out_f = np.empty((nt, 3), np.int64)
        if nv:
            lib.simplify_copy(handle, out_v, out_f)
        return out_v, out_f
    finally:
        lib.simplify_free(handle)


class KDTree:
    """Nearest-neighbor queries against a fixed 3-D point set."""

    def __init__(self, points: np.ndarray):
        self._lib = get_lib()
        self._pts = np.ascontiguousarray(points, np.float32)
        self._handle = self._lib.kdtree_build(self._pts, len(self._pts))

    def query(
        self, queries: np.ndarray, k: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(dist, idx) of the k nearest points per query, ascending.

        k=1 returns (m,) arrays (the metric-suite path); k>1 returns
        (m, k) — parity with pykdtree's KDTree.query(k=...)
        (libkdtree/pykdtree/kdtree.pyx:132)."""
        q = np.ascontiguousarray(queries, np.float32)
        if k == 1:
            dist = np.empty(len(q), np.float32)
            idx = np.empty(len(q), np.int32)
            self._lib.kdtree_query(self._handle, q, len(q), dist, idx)
            return dist, idx
        dist = np.empty((len(q), k), np.float32)
        idx = np.empty((len(q), k), np.int32)
        self._lib.kdtree_query_k(self._handle, q, len(q), k, dist, idx)
        return dist, idx

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None


def check_mesh_contains(
    verts: np.ndarray, faces: np.ndarray, queries: np.ndarray, resolution: int = 128
) -> np.ndarray:
    """Boolean inside-mask of query points w.r.t. a closed mesh."""
    lib = get_lib()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    q = np.ascontiguousarray(queries, np.float32)
    handle = lib.inside_mesh_build(v, len(v), f, len(f), int(resolution))
    try:
        out = np.empty(len(q), np.uint8)
        lib.inside_mesh_query(handle, q, len(q), out)
        return out.astype(bool)
    finally:
        lib.inside_mesh_free(handle)


def voxelize_mesh(
    verts: np.ndarray, faces: np.ndarray, resolution: int
) -> np.ndarray:
    """Surface voxelization by triangle-box overlap (replaces the
    reference's libvoxelize). Vertices are mapped to grid coordinates over
    their bounding box; returns a (res, res, res) bool grid."""
    lib = get_lib()
    v = np.asarray(verts, np.float32)
    lo = v.min(0)
    extent = max(float((v.max(0) - lo).max()), 1e-9)
    grid_v = np.ascontiguousarray((v - lo) / extent * resolution, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    occ = np.zeros((resolution, resolution, resolution), np.uint8)
    lib.voxelize_mesh(grid_v, len(grid_v), f, len(f), resolution,
                      resolution, resolution, occ)
    return occ.astype(bool)
