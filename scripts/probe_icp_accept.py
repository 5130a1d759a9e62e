"""Evaluate inference-time acceptance rules for the post-refinement ICP.

Round-4 finding (docs/ablate_optim_r4.json): the reference's unconditional
ICP polish after the SE(3) refinement (more_solver.py:181-184) *hurts* on
the 48-instance benchmark — recall@RRE10 85.42 with ICP vs 93.75 without,
median GT-chamfer 3x worse — because ICP has its own fixed point per
instance and overwrites the refinement where its basin is wrong.

ICP helps some instances (12/48) and hurts others (21/48), so the right
production behavior is per-instance acceptance: keep the ICP pose only
where an inference-time proxy says it improved the alignment. This script
measures which proxy tracks ground truth:

  symm. chamfer   mean NN distance (both directions) between T(pc1), pc2
  sdf             mean |decoder sdf| of T(pc1) under the target's code
                  (the geometry term of the refinement loss itself)

For each of the 48 instances it records GT rotation error + proxies for
  kab        Kabsch init
  kab_icp    Kabsch + ICP               (the reference's non-optim path)
  ref        Kabsch + 400-step refine   (noicp)
  ref_icp    Kabsch + refine + ICP      (the reference's optim path)
then scores selection rules (always/never/proxy-argmin/oracle) over the
{ref, ref_icp} pair.

    python scripts/probe_icp_accept.py --out docs/probe_icp_accept_r4.json
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
if os.environ.get("LSTPU_CPU"):
    # The env var JAX_PLATFORMS=cpu alone is overridden by the axon
    # plugin (and a bare device query hangs forever when the tunnel is
    # down) — the config call is the reliable pin (verify-skill note).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from demo_trained_eval import build_benchmark


def symm_chamfer(a, b):
    """(B, N, 3), (B, M, 3) -> (B,) symmetric mean NN distance."""
    d = jnp.linalg.norm(a[:, :, None] - b[:, None], axis=-1)
    return jnp.min(d, axis=2).mean(axis=1) + jnp.min(d, axis=1).mean(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="weights/plateau_r4_selected.ckpt")
    ap.add_argument("--root", default="/tmp/lstpu_probe_icp")
    ap.add_argument("--n-scenes", type=int, default=12)
    ap.add_argument("--n-pts", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7,
                    help="benchmark shape/translation seed (7 = the "
                    "standard capstone set; use a fresh value for a "
                    "held-out validation of the acceptance rule)")
    ap.add_argument("--rot-seed", type=int, default=None,
                    help="rotation stream base (None = historical 100+s)")
    ap.add_argument("--family", default="train",
                    choices=["train", "torus"],
                    help="shape family: 'train' = the box/ellipsoid/"
                    "capsule kinds the checkpoint saw; 'torus' = genus-1 "
                    "held-out family (never trained on)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    shape_kinds = (0, 1, 2) if args.family == "train" else (3,)

    from livingscenes_tpu import se3
    from livingscenes_tpu.eval.flyingshape import FlyingShapeDataset, _iter_scenes
    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.ops.icp import iterative_closest_point
    from livingscenes_tpu.solver import MoreSolver, MoreSolverConfig
    from livingscenes_tpu.solver.registration import RegistrationConfig

    build_benchmark(args.root, n_scenes=args.n_scenes, n_pts=args.n_pts,
                    seed=args.seed, rot_seed=args.rot_seed,
                    shape_kinds=shape_kinds)
    dataset = FlyingShapeDataset(args.root)
    base = load_solver(args.ckpt)

    noicp = dataclasses.replace(RegistrationConfig(), use_icp=False)
    solver = MoreSolver(
        base.model, base.params,
        MoreSolverConfig(n_input_point=args.n_pts, registration=noicp),
    )
    model, params = base.model, base.params

    def gt_err(R, t, gt):
        rre = np.asarray(se3.rotation_error(R, gt[..., :3, :3]))
        rre = np.minimum.reduce([rre, np.abs(180 - rre), np.abs(90 - rre)])
        return rre

    records = []
    for i_scene, scene in enumerate(_iter_scenes(dataset)):
        ref_scan = scene[0]
        rescan = scene[1]
        gt = se3.concatenate(
            jnp.asarray(rescan["transform"]),
            se3.inverse(jnp.asarray(ref_scan["transform"])),
        )
        pc1 = jnp.asarray(ref_scan["pc"])
        pc2 = jnp.asarray(rescan["pc"])
        codes1 = solver._encode(pc1)
        codes2 = solver._encode(pc2)

        poses = {}
        R_kab, t_kab = solver.solve_pairwise_registration(
            pc1, pc2, optim=False, codes1=codes1, codes2=codes2
        )
        poses["kab"] = (R_kab, t_kab)
        R_ref, t_ref = solver.solve_pairwise_registration(
            pc1, pc2, optim=True, codes1=codes1, codes2=codes2
        )
        poses["ref"] = (R_ref, t_ref)
        for src, dst in (("kab", "kab_icp"), ("ref", "ref_icp")):
            R0, t0 = poses[src]
            res = iterative_closest_point(
                pc1, pc2, init_R=R0, init_t=t0[..., 0], max_iterations=100
            )
            poses[dst] = (res.R, res.t[..., None])

        row = {"scene": i_scene}
        for name, (R, t) in poses.items():
            moved = jnp.einsum("bij,bnj->bni", R, pc1) + t[..., 0][:, None]
            sc = np.asarray(symm_chamfer(moved, pc2))
            sdf = np.asarray(
                jnp.abs(model.decode_sdf(params, moved, codes2)).mean(axis=-1)
            )
            rre = gt_err(R, t, gt)
            row[name] = {
                "rre": rre.tolist(),
                "symch": sc.tolist(),
                "sdf": sdf.tolist(),
            }
        records.append(row)
        print(f"scene {i_scene} done", flush=True)

    # -- score selection rules over {ref, ref_icp} ---------------------------
    def flat(name, key):
        return np.concatenate([np.asarray(r[name][key]) for r in records])

    out = {"n": int(flat("ref", "rre").size)}
    rre = {k: flat(k, "rre") for k in ("kab", "kab_icp", "ref", "ref_icp")}
    for k, v in rre.items():
        out[k] = {
            "recall_rre10": round(float((v < 10).mean() * 100), 2),
            "recall_rre5": round(float((v < 5).mean() * 100), 2),
            "median_rre": round(float(np.median(v)), 3),
        }

    rules = {}
    for proxy in ("symch", "sdf"):
        take_icp = flat("ref_icp", proxy) < flat("ref", proxy)
        sel = np.where(take_icp, rre["ref_icp"], rre["ref"])
        rules[f"accept_by_{proxy}"] = {
            "recall_rre10": round(float((sel < 10).mean() * 100), 2),
            "recall_rre5": round(float((sel < 5).mean() * 100), 2),
            "median_rre": round(float(np.median(sel)), 3),
            "icp_taken_frac": round(float(take_icp.mean()), 3),
        }
    oracle = np.minimum(rre["ref"], rre["ref_icp"])
    rules["oracle"] = {
        "recall_rre10": round(float((oracle < 10).mean() * 100), 2),
        "recall_rre5": round(float((oracle < 5).mean() * 100), 2),
        "median_rre": round(float(np.median(oracle)), 3),
    }
    out["rules"] = rules
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": out, "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
