"""Host-simplify phase profile on analytic 129^3 grids (no TPU needed).

VERDICT r4 weak #5 / ask #6: simplify dominates host meshing (213.4 of
274.5 ms/grid on trained-checkpoint grids, BENCH_r04 mesh_stats) and had
no committed phase breakdown. This builds procedural-family shapes
(train/data.SyntheticShapeDataset SDFs — the same content family the
bench meshes) as DENSE host-evaluated 129^3 logit grids, runs the native
extraction at production settings, and prints the per-phase simplify
split (LSTPU_SIMPLIFY_PROFILE=1 stderr lines from simplify.cpp).

    python scripts/profile_simplify.py --n 8
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("LSTPU_SIMPLIFY_PROFILE", "1")

import numpy as np


def make_grid(seed: int, n: int = 129, box: float = 1.1):
    from livingscenes_tpu.train.data import SyntheticShapeDataset

    ds = SyntheticShapeDataset(n_items=1, n_pcl=64)
    rng = np.random.default_rng(seed)
    sdf = ds._shape_sdf(rng)
    idx = np.linspace(-0.5 * box, 0.5 * box, n).astype(np.float32)
    pts = np.stack(
        np.meshgrid(idx, idx, idx, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    # occupancy-logit-like field: positive inside, like the decoder grids
    return (-sdf(pts)).astype(np.float32).reshape(n, n, n)


def chamfer_to_raw(mesh, raw_mesh, n: int = 30000, seed: int = 0):
    """Symmetric chamfer (mean NN distance both ways) between surface
    samples of the simplified mesh and the raw (unsimplified) mesh —
    the quality gate for simplifier changes ("equal chamfer")."""
    from scipy.spatial import cKDTree

    a = mesh.sample_surface(n, seed=seed)
    b = raw_mesh.sample_surface(n, seed=seed + 1)
    da = cKDTree(b).query(a)[0].mean()
    db = cKDTree(a).query(b)[0].mean()
    return float(da + db) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--target", type=int, default=5000)
    ap.add_argument("--agg", type=float, default=None)
    ap.add_argument("--chamfer", action="store_true",
                    help="also report chamfer(simplified, raw) per grid")
    args = ap.parse_args()

    from livingscenes_tpu.recon.extractor import (
        MeshExtractorConfig,
        extract_mesh_from_grid,
    )

    kw = {} if args.agg is None else {"simplify_aggressiveness": args.agg}
    cfg = MeshExtractorConfig(simplify_nfaces=args.target, **kw)
    raw_cfg = MeshExtractorConfig(simplify_nfaces=None)  # no simplify
    stats_all = []
    for i in range(args.n):
        grid = make_grid(100 + i)
        st = {}
        t0 = time.perf_counter()
        mesh = extract_mesh_from_grid(grid, cfg, stats=st)
        st["total_ms"] = (time.perf_counter() - t0) * 1e3
        st["empty"] = mesh.is_empty
        line = (
            f"grid {i}: total {st['total_ms']:.1f} ms "
            f"(iso {st.get('iso_ms', 0):.1f}, "
            f"simplify {st.get('simplify_ms', 0):.1f}) "
            f"faces_raw {st.get('faces_raw', 0)} -> {st.get('faces', 0)}"
        )
        if args.chamfer:
            raw = extract_mesh_from_grid(grid, raw_cfg)
            st["chamfer"] = chamfer_to_raw(mesh, raw)
            line += f" chamfer {st['chamfer']:.5f}"
        stats_all.append(st)
        print(line)
    mean = lambda k: float(np.mean([s.get(k, 0.0) for s in stats_all]))
    out = (
        f"\nmean: total {mean('total_ms'):.1f} ms, iso {mean('iso_ms'):.1f},"
        f" simplify {mean('simplify_ms'):.1f}, faces_raw"
        f" {mean('faces_raw'):.0f}"
    )
    if args.chamfer:
        out += f", chamfer {mean('chamfer'):.5f}"
    print(out)


if __name__ == "__main__":
    main()
