"""Root-cause the 48-instance optim-path accuracy regression.

Round-3 finding (VERDICT r3 weak #3): on the 16-instance capstone the
400-step SE(3) refinement improves recall@RRE10 (93.75 > 87.5) but on the
3x larger 48-instance benchmark it DEGRADES it (81.25 < 83.33). The
production relocalization path (lib_more/more_solver.py:119-178) exists
to improve poses, so either a mechanism knob is wrong at this scale or
specific shape geometries defeat the refinement.

This script reruns the 48-instance benchmark (same seeds as
scripts/demo_trained_eval.py) under ablations of every candidate
mechanism:

  base          Kabsch + ICP only (no refinement)
  optim         production refinement config
  nodir         direction pick disabled (always pc1 -> pc2)
  nobest        final iterate instead of best-loss tracking
  stop5/stop20  early-stop drift threshold 5 / 20 deg
  blur02/blur001 Sinkhorn blur 0.2 / 0.01 (synthetic shapes are ~0.5
                world units vs ShapeNet-normalized ~1.0 — the default
                0.05 blur may be mis-scaled for this benchmark)
  noicp         refinement WITHOUT the final ICP polish
  sdfonly       refinement loss without the OT term (blur -> huge, so OT
                gradient ~ 0)  [approximated by sinkhorn weight 0]

and writes per-instance (scene, obj, rre, rte, chamfer) records per
variant so regressing instances can be attributed to shape geometry
(symmetry) vs optimizer behavior.

    python scripts/ablate_optim.py --ckpt weights/plateau_r4_selected.ckpt \
        --n-scenes 12 --out docs/ablate_optim_r4.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from demo_trained_eval import build_benchmark


def run_variant(dataset, solver, optim: bool):
    """Per-instance relocalization records (eval_flyingshape.py:110-173
    loop, instrumented)."""
    from livingscenes_tpu import se3
    from livingscenes_tpu.eval.flyingshape import _iter_scenes

    records = []
    for i_scene, scene in enumerate(_iter_scenes(dataset)):
        ref = scene[0]
        for rescan in scene[1:2]:
            gt = se3.concatenate(
                jnp.asarray(rescan["transform"]),
                se3.inverse(jnp.asarray(ref["transform"])),
            )
            pc1 = jnp.asarray(ref["pc"])
            pc2 = jnp.asarray(rescan["pc"])
            R, t = solver.solve_pairwise_registration(pc1, pc2, optim=optim)
            rre = np.asarray(se3.rotation_error(R, gt[..., :3, :3]))
            rte = np.asarray(se3.translation_error(t, gt[..., :3, 3:]))
            rre = np.minimum.reduce([rre, np.abs(180 - rre), np.abs(90 - rre)])
            pred = np.asarray(se3.rt_to_se3(R, t))
            for i in range(pc1.shape[0]):
                cd = se3.chamfer_distance_under_transforms(
                    pc1[i : i + 1], pc2[i : i + 1],
                    jnp.asarray(pred[i : i + 1]), gt[i : i + 1],
                )
                records.append(
                    {
                        "scene": i_scene,
                        "obj": i,
                        "rre": float(rre[i]),
                        "rte": float(rte[i]),
                        "chamfer": float(cd[0]),
                    }
                )
    return records


def summarize(records):
    rre = np.array([r["rre"] for r in records])
    cd = np.array([r["chamfer"] for r in records])
    sel10 = rre < 10
    sel5 = rre < 5
    return {
        "recall_rre10": round(float(sel10.mean() * 100), 2),
        "recall_rre5": round(float(sel5.mean() * 100), 2),
        "median_rre": round(float(np.median(rre)), 3),
        "median_chamfer": float(np.median(cd)),
        "n": len(records),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="weights/plateau_r4_selected.ckpt")
    ap.add_argument("--root", default="/tmp/lstpu_ablate_optim")
    ap.add_argument("--n-scenes", type=int, default=12)
    ap.add_argument("--n-pts", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--variants", default=None,
                    help="comma list; default: all")
    args = ap.parse_args()

    from livingscenes_tpu.eval.flyingshape import FlyingShapeDataset
    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.solver import MoreSolver, MoreSolverConfig
    from livingscenes_tpu.solver.registration import RegistrationConfig

    build_benchmark(args.root, n_scenes=args.n_scenes, n_pts=args.n_pts)
    dataset = FlyingShapeDataset(args.root)
    base = load_solver(args.ckpt)

    prod = RegistrationConfig()
    variants = {
        "base": (prod, False),
        "optim": (prod, True),
        "nodir": (dataclasses.replace(prod, direction_pick=False), True),
        "nobest": (dataclasses.replace(prod, track_best=False), True),
        "stop5": (dataclasses.replace(prod, early_stop_deg=5.0), True),
        "stop20": (dataclasses.replace(prod, early_stop_deg=20.0), True),
        "blur02": (dataclasses.replace(prod, sinkhorn_blur=0.2), True),
        "blur001": (dataclasses.replace(prod, sinkhorn_blur=0.01), True),
        "noicp": (dataclasses.replace(prod, use_icp=False), True),
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    all_records = {}
    for name, (reg_cfg, optim) in variants.items():
        solver = MoreSolver(
            base.model,
            base.params,
            MoreSolverConfig(
                n_input_point=args.n_pts, registration=reg_cfg
            ),
        )
        recs = run_variant(dataset, solver, optim=optim)
        all_records[name] = recs
        results[name] = summarize(recs)
        print(name, json.dumps(results[name]), flush=True)

    # Attribution: which instances regress optim vs base?
    if "base" in all_records and "optim" in all_records:
        flips = []
        for rb, ro in zip(all_records["base"], all_records["optim"]):
            if (rb["rre"] < 10) != (ro["rre"] < 10):
                flips.append(
                    {
                        "scene": rb["scene"],
                        "obj": rb["obj"],
                        "rre_base": round(rb["rre"], 2),
                        "rre_optim": round(ro["rre"], 2),
                    }
                )
        results["flips_base_vs_optim"] = flips
        print("flips:", json.dumps(flips), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"summary": results, "records": all_records}, f, indent=1
            )


if __name__ == "__main__":
    main()
