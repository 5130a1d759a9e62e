"""Depth rendering and back-projection (training-data creation).

Python side of the native z-buffer rasterizer (native/src/rasterize.cpp),
re-designing the reference's data-creation tooling (utils/render.py:50-132,
pyrender EGL helpers): render depth maps of a mesh from sampled viewpoints
and back-project them into partial point clouds — the inputs the
production training config uses (input_mode: dep,
configs/3rscan/dgcnn_attn_inner.yaml:70).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..recon.mesh import Mesh


@dataclasses.dataclass(frozen=True)
class Camera:
    width: int = 240
    height: int = 240
    fx: float = 240.0
    fy: float = 240.0

    @property
    def cx(self) -> float:
        return self.width / 2.0

    @property
    def cy(self) -> float:
        return self.height / 2.0


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)):
    """World->camera rotation/translation for a camera at `eye` looking at
    `target` (camera looks down -z, y up)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    R_w2c = np.stack([right, true_up, -fwd])  # rows
    t_w2c = -R_w2c @ eye
    return R_w2c, t_w2c


def render_depth(
    mesh: Mesh,
    R_w2c: np.ndarray,
    t_w2c: np.ndarray,
    camera: Camera = Camera(),
) -> np.ndarray:
    """Depth image (h, w) float32; 0 where no surface is hit."""
    from ..native.bindings import get_lib
    import ctypes

    lib = get_lib()
    if not hasattr(lib, "_raster_configured"):
        import numpy.ctypeslib as npc

        f32p = npc.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = npc.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rasterize_depth.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib._raster_configured = True

    cam_verts = (mesh.vertices @ R_w2c.T + t_w2c).astype(np.float32)
    faces = np.ascontiguousarray(mesh.faces, np.int64)
    depth = np.empty((camera.height, camera.width), np.float32)
    lib.rasterize_depth(
        np.ascontiguousarray(cam_verts), len(cam_verts), faces, len(faces),
        camera.fx, camera.fy, camera.cx, camera.cy,
        camera.width, camera.height, depth,
    )
    return depth


def backproject_depth(
    depth: np.ndarray,
    R_w2c: np.ndarray,
    t_w2c: np.ndarray,
    camera: Camera = Camera(),
) -> np.ndarray:
    """Depth image -> world-space point cloud (N, 3)
    (utils/render.py:93 pointcloud)."""
    h, w = depth.shape
    v, u = np.nonzero(depth > 0)
    z = depth[v, u]
    x = (u + 0.5 - camera.cx) / camera.fx * z
    y = (camera.cy - (v + 0.5)) / camera.fy * z
    cam_pts = np.stack([x, y, -z], axis=-1)
    return (cam_pts - t_w2c) @ R_w2c


def render_partial_clouds(
    mesh: Mesh,
    n_views: int = 12,
    camera: Camera = Camera(),
    radius_range: Tuple[float, float] = (1.6, 2.4),
    seed: int = 0,
    max_points_per_view: Optional[int] = 4096,
):
    """Sample viewpoints on a sphere, render depth, back-project — one
    partial cloud per view (the dep_pcl_*.npz content of the training
    layout)."""
    rng = np.random.default_rng(seed)
    center = mesh.vertices.mean(0)
    clouds = []
    for _ in range(n_views):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        r = rng.uniform(*radius_range)
        eye = center + d * r
        R, t = look_at(eye, center)
        depth = render_depth(mesh, R, t, camera)
        pts = backproject_depth(depth, R, t, camera)
        if max_points_per_view and len(pts) > max_points_per_view:
            sel = rng.choice(len(pts), max_points_per_view, replace=False)
            pts = pts[sel]
        clouds.append(pts.astype(np.float32))
    return clouds
