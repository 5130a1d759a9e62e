"""Capstone demo: train -> evaluate the full benchmark surface.

Takes a trained checkpoint (e.g. from configs/demo_round2.yaml), builds a
procedural FlyingShape-format benchmark (same shape family as the
synthetic training set, with analytic-SDF ground-truth meshes), and runs
the real eval drivers: matching, relocalization (with and without the
400-step refinement) and reconstruction with chamfer / volumetric IoU /
SDF-recall — the full eval_flyingshape.py:62-214 surface with trained
weights.

    python scripts/demo_trained_eval.py --ckpt /tmp/lstpu_demo_r2/checkpoint/selected.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation


def build_benchmark(root: str, n_scenes: int = 4, n_obj: int = 4,
                    n_pts: int = 512, seed: int = 7, rot_seed=None,
                    shape_kinds=(0, 1, 2)):
    """Procedural FlyingShape tree + analytic GT meshes.

    ``seed`` drives shape geometry / translations; ``rot_seed`` (None =
    the historical 100+s stream) drives the scan_001 rotations. Pass a
    fresh (seed, rot_seed) pair for held-out instances that share zero
    randomness with the standard seed-7 capstone benchmark, and
    ``shape_kinds=(3,)`` for the torus family (out-of-family held-out set).
    """
    from livingscenes_tpu.recon.extractor import marching_isosurface
    from livingscenes_tpu.recon.mesh import Mesh
    from livingscenes_tpu.train.data import SyntheticShapeDataset

    ds = SyntheticShapeDataset(n_items=1, n_pcl=n_pts, shape_kinds=shape_kinds)
    rng = np.random.default_rng(seed)
    gt_meshes = {}

    # Prune stale scene dirs from a previous, larger build in the same
    # root: FlyingShapeDataset globs every scene_* dir, so leftovers from
    # an earlier n_scenes=N build would silently dilute an n_scenes<N
    # evaluation with instances whose GT meshes this call never returns
    # (each scores 0.0 — exactly how the first r5 48-inst comparison run
    # produced viou 36.5 = 73/2).
    import glob as _glob
    import shutil as _shutil

    for stale in _glob.glob(os.path.join(root, f"shape_{n_obj}", "scene_*")):
        if int(os.path.basename(stale).split("_")[1]) >= n_scenes:
            _shutil.rmtree(stale)

    for s in range(n_scenes):
        scene_dir = os.path.join(root, f"shape_{n_obj}", f"scene_{s:03d}")
        os.makedirs(scene_dir, exist_ok=True)
        pcs, poses1, class_ids, obj_ids = [], [], [], []
        for o in range(n_obj):
            sdf = ds._shape_sdf(rng)
            surf = ds._surface_points(sdf, rng, n_pts)
            offset = rng.uniform(-2.0, 2.0, 3)
            pcs.append(surf + offset)
            class_ids.append("proc")
            obj_ids.append(f"s{s}_o{o}")

            # analytic GT mesh in the scan_000 world frame
            res = 64
            idx = np.linspace(-0.6, 0.6, res)
            X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
            grid = sdf(
                np.stack([X, Y, Z], -1).reshape(-1, 3)
            ).reshape(res, res, res)
            v, f = marching_isosurface(grid.astype(np.float32), 0.0)
            v = v / (res - 1) * 1.2 - 0.6 + offset
            gt_meshes[("proc", f"s{s}_o{o}")] = Mesh(
                v.astype(np.float32), f.astype(np.int64)
            )

        pcs = np.stack(pcs).astype(np.float32)
        rot_state = (100 + s) if rot_seed is None else (rot_seed + s)
        Rm = Rotation.random(n_obj, random_state=rot_state).as_matrix()
        tm = rng.normal(size=(n_obj, 3)) * 0.4
        moved = np.einsum("bij,bnj->bni", Rm, pcs) + tm[:, None]
        t0 = np.tile(np.eye(4), (n_obj, 1, 1)).astype(np.float32)
        t1 = np.tile(np.eye(4), (n_obj, 1, 1)).astype(np.float32)
        t1[:, :3, :3] = Rm
        t1[:, :3, 3] = tm
        common = dict(
            class_id=np.array(class_ids), obj_id=np.array(obj_ids)
        )
        np.savez(
            os.path.join(scene_dir, "scan_000.npz"),
            pc=pcs.transpose(0, 2, 1), transform=t0, **common,
        )
        np.savez(
            os.path.join(scene_dir, "scan_001.npz"),
            pc=moved.astype(np.float32).transpose(0, 2, 1),
            transform=t1, **common,
        )
    return gt_meshes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--root", default="/tmp/lstpu_trained_eval")
    parser.add_argument("--out", default=None)
    parser.add_argument("--n-pts", type=int, default=512)
    parser.add_argument("--recon-upsample", type=int, default=1,
                        help="mesh extractor upsampling steps (demo: 64^3)")
    parser.add_argument("--optim", action="store_true",
                        help="also run the 400-step refined relocalization")
    parser.add_argument("--n-scenes", type=int, default=4,
                        help="benchmark size (n_scenes x 4 objects)")
    parser.add_argument("--seed", type=int, default=7,
                        help="shape/translation seed (7 = standard capstone)")
    parser.add_argument("--rot-seed", type=int, default=None,
                        help="rotation stream base (None = historical 100+s)")
    parser.add_argument("--icp-accept", default=None,
                        choices=["symch", "always", "sdf"],
                        help="ICP acceptance policy (None = production "
                        "default 'symch'; 'always' = reference-faithful "
                        "unconditional polish, more_solver.py:181-188)")
    args = parser.parse_args()

    from livingscenes_tpu.eval.flyingshape import (
        FlyingShapeDataset,
        eval_matching,
        eval_reconstruction,
        eval_relocalization,
    )
    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.solver import MoreSolver, MoreSolverConfig
    from livingscenes_tpu.recon.extractor import MeshExtractorConfig

    from livingscenes_tpu.solver.registration import RegistrationConfig

    gt_meshes = build_benchmark(
        args.root, n_scenes=args.n_scenes, n_pts=args.n_pts,
        seed=args.seed, rot_seed=args.rot_seed,
    )
    base = load_solver(args.ckpt)
    reg_cfg = (
        RegistrationConfig(icp_accept=args.icp_accept)
        if args.icp_accept else RegistrationConfig()
    )
    solver = MoreSolver(
        base.model,
        base.params,
        MoreSolverConfig(
            n_input_point=args.n_pts,
            registration=reg_cfg,
            mesh_extractor=MeshExtractorConfig(
                resolution0=32, upsampling_steps=args.recon_upsample,
                simplify_nfaces=5000,
            ),
        ),
    )
    dataset = FlyingShapeDataset(args.root)

    import time

    results = {}
    t0 = time.perf_counter()
    results["matching"] = eval_matching(dataset, solver)
    print(f"[matching done {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    results["relocalization"] = eval_relocalization(
        dataset, solver, optim=False
    )
    print(f"[reloc done {time.perf_counter()-t0:.0f}s]", flush=True)
    if args.optim:
        t0 = time.perf_counter()
        results["relocalization_optim"] = eval_relocalization(
            dataset, solver, optim=True
        )
        print(f"[reloc-optim done {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    results["reconstruction"] = eval_reconstruction(
        dataset, solver,
        gt_mesh_loader=lambda c, o: gt_meshes.get((c, o)),
    )
    print(f"[recon done {time.perf_counter()-t0:.0f}s]", flush=True)
    print(json.dumps(results, indent=1, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=float)


if __name__ == "__main__":
    main()
