"""Training-data preprocessing: watertight meshes -> the on-disk layout the
training pipeline reads (train/data.py ShapeNetSDFDataset).

The reference ships preprocessed ShapeNet data (pointcloud.npz /
points_uni.npz / points_nss.npz / dep_pcl_*.npz per object,
lib_shape_prior/dataset/shapenet_new2.py:278-307) produced by external
tooling (depth rendering via utils/render.py + SDF sampling). This module
makes the framework self-sufficient: given any watertight mesh it computes

* surface samples (pointcloud.npz),
* uniform-box SDF samples (points_uni.npz)  — |d| from a surface kd-tree,
  sign from the native point-in-mesh test,
* near-surface SDF samples (points_nss.npz),
* multi-view depth-rendered partial clouds (dep_pcl_*.npz) via the native
  rasterizer.

Usage:
    python -m livingscenes_tpu.tools.preprocess --mesh chair.ply \
        --out data/shapenet/03001627/chair0 --views 12
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from ..native.bindings import KDTree, check_mesh_contains
from ..recon.mesh import Mesh
from ..recon.render import Camera, render_partial_clouds
from ..utils.io import load_ply


def normalize_mesh(mesh: Mesh, padding: float = 0.1) -> Mesh:
    """Center + scale the mesh into the extraction cube [-0.5, 0.5]
    (matching the canonical frame the decoder is trained in)."""
    lo = mesh.vertices.min(0)
    hi = mesh.vertices.max(0)
    center = (lo + hi) / 2.0
    scale = (hi - lo).max() * (1.0 + padding)
    out = mesh.copy()
    out.vertices = (out.vertices - center) / scale
    return out


def compute_sdf(mesh: Mesh, queries: np.ndarray, n_surface: int = 100000,
                seed: int = 0) -> np.ndarray:
    """Signed distances: unsigned distance to surface samples (native
    kd-tree), sign from ray-parity containment (native triangle hash)."""
    surf = mesh.sample_surface(n_surface, seed=seed).astype(np.float32)
    tree = KDTree(surf)
    dist, _ = tree.query(queries.astype(np.float32))
    inside = check_mesh_contains(
        mesh.vertices.astype(np.float32),
        mesh.faces.astype(np.int64),
        queries.astype(np.float32),
    )
    return np.where(inside, -dist, dist).astype(np.float32)


def preprocess_mesh(
    mesh: Mesh,
    out_dir: str,
    n_pointcloud: int = 30000,
    n_uni: int = 100000,
    n_nss: int = 100000,
    nss_std: float = 0.05,
    n_views: int = 12,
    camera: Optional[Camera] = None,
    seed: int = 0,
    normalize: bool = True,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    if normalize:
        mesh = normalize_mesh(mesh)

    surface = mesh.sample_surface(n_pointcloud, seed=seed).astype(np.float32)
    np.savez(os.path.join(out_dir, "pointcloud.npz"), points=surface)

    uni = rng.uniform(-0.55, 0.55, (n_uni, 3)).astype(np.float32)
    np.savez(
        os.path.join(out_dir, "points_uni.npz"),
        points=uni,
        sdf=compute_sdf(mesh, uni, seed=seed),
    )

    nss = surface[rng.choice(len(surface), n_nss)] + rng.normal(
        0, nss_std, (n_nss, 3)
    ).astype(np.float32)
    nss = nss.astype(np.float32)
    np.savez(
        os.path.join(out_dir, "points_nss.npz"),
        points=nss,
        sdf=compute_sdf(mesh, nss, seed=seed + 1),
    )

    clouds = render_partial_clouds(
        mesh, n_views=n_views, camera=camera or Camera(), seed=seed
    )
    for i, pcl in enumerate(clouds):
        np.savez(os.path.join(out_dir, f"dep_pcl_{i}.npz"), pcl=pcl)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", required=True, help="watertight PLY mesh")
    parser.add_argument("--out", required=True)
    parser.add_argument("--views", type=int, default=12)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    v, f = load_ply(args.mesh)
    assert f is not None, "mesh PLY must contain faces"
    preprocess_mesh(Mesh(v, f), args.out, n_views=args.views, seed=args.seed)


if __name__ == "__main__":
    main()
