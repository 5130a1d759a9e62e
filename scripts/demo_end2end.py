"""Runnable end-to-end demo: build a synthetic two-scan scene, run the full
MORE pipeline (encode -> match -> register -> transport -> mesh) and write
visualization artifacts.

    python scripts/demo_end2end.py [--out /tmp/demo] [--ckpt trained.ckpt]

Without a checkpoint the prior uses random (but equivariant) weights —
matching and registration are still correct because they follow from
equivariance; reconstruction quality requires trained weights.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/lstpu_demo")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--objects", type=int, default=4)
    parser.add_argument("--optim", action="store_true")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from livingscenes_tpu import se3
    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.utils.viz import (
        visualize_registration,
        visualize_shape_matching,
        write_png,
    )

    solver = load_solver(args.ckpt)

    # --- synthetic scene: O objects, rescan rigidly moved + permuted
    rng = np.random.default_rng(0)
    O, N = args.objects, 1024
    objs = rng.uniform(-0.5, 0.5, (O, N, 3)).astype(np.float32) * rng.uniform(
        0.3, 1.0, (O, 1, 3)
    ).astype(np.float32)
    objs += rng.uniform(-3, 3, (O, 1, 3)).astype(np.float32)
    Rm = Rotation.random(O, random_state=1).as_matrix().astype(np.float32)
    tm = rng.normal(size=(O, 1, 3)).astype(np.float32) * 0.5
    rescan = np.einsum("oij,onj->oni", Rm, objs) + tm
    perm = rng.permutation(O)
    rescan = rescan[perm]

    out = solver.solve_end2end(
        jnp.asarray(objs), None, jnp.asarray(rescan), None,
        optim=args.optim, extract_meshes=True,
    )
    m0 = np.asarray(out["matches0"])
    inv_pos = {int(p): i for i, p in enumerate(perm)}
    correct = [m0[i] == inv_pos[i] for i in range(O)]
    print(f"matching: {sum(correct)}/{O} correct -> {m0.tolist()}")

    tsfm = np.asarray(out["registration"])
    for i in range(O):
        rre = float(
            se3.rotation_error(
                jnp.asarray(tsfm[i, :3, :3])[None], jnp.asarray(Rm[i])[None]
            )[0]
        )
        rte = float(np.linalg.norm(tsfm[i, :3, 3] - tm[i, 0]))
        print(f"object {i}: RRE {rre:.3f} deg  RTE {rte:.4f} m")

    img = visualize_shape_matching(list(objs), list(rescan), m0)
    write_png(os.path.join(args.out, "matching.png"), img)
    img = visualize_registration(objs[0], rescan[inv_pos[0]], tsfm[0])
    write_png(os.path.join(args.out, "registration.png"), img)
    for i, mesh in enumerate(out["mesh_list"]):
        if mesh is not None and not mesh.is_empty:
            mesh.export_obj(os.path.join(args.out, f"recon_{i}.obj"))
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
