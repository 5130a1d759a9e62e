"""Measure (don't assume) host-meshing throughput + thread scaling.

VERDICT r3 weak #7: the claim "a 16-core host runs 16 grids concurrently"
rested on the ctypes kernels releasing the GIL, never measured. This
script measures, on trained-checkpoint grids at the production extraction
settings:

1. per-grid isosurface + simplify ms (the number a multi-core host is
   projected from),
2. thread-pool wall time at workers in {1, 2} (on this 1-vCPU box the
   expected ratio is ~1.0 — no speedup, but also no GIL serialization
   penalty),
3. a direct GIL-release proof: a pure-Python counter thread runs
   concurrently with one native meshing call; its progress relative to
   an idle-interpreter baseline is the fraction of the meshing call that
   holds the GIL released. ~1.0 => the native kernels release the GIL
   and meshing scales with cores; ~0.0 => they hold it and the thread
   pool is decorative.

    python scripts/measure_meshing.py --batch 8
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def spinner_progress(duration_fn):
    """Run duration_fn in the main thread while a Python counter thread
    spins; return (counter_rate, elapsed)."""
    stop = threading.Event()
    count = [0]

    def spin():
        c = 0
        while not stop.is_set():
            c += 1
            count[0] = c

    th = threading.Thread(target=spin)
    th.start()
    time.sleep(0.05)  # let the spinner reach steady state
    t0 = time.perf_counter()
    duration_fn()
    dt = time.perf_counter() - t0
    stop.set()
    th.join()
    return count[0] / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res0", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(__file__), "..", "weights",
        "plateau_r4_selected.ckpt"))
    args = ap.parse_args()

    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.recon.extractor import (
        MeshExtractorConfig,
        extract_mesh_from_grid,
    )
    from livingscenes_tpu.recon.grid import batched_hierarchical_grid_values
    from livingscenes_tpu.train.data import SyntheticShapeDataset

    solver = load_solver(
        args.ckpt, fast=jax.devices()[0].platform == "tpu"
    )
    model, params = solver.model, solver.params

    ds = SyntheticShapeDataset(n_items=1, n_pcl=512)
    rng = np.random.default_rng(3)
    clouds = np.stack([
        ds._surface_points(ds._shape_sdf(rng), rng, 512)
        for _ in range(args.batch)
    ])
    codes = model.encode(params, jnp.asarray(clouds, jnp.float32))
    canonical = dict(
        codes, s=jnp.ones_like(codes["s"]), t=jnp.zeros_like(codes["t"])
    )
    cfg = MeshExtractorConfig(
        resolution0=args.res0, upsampling_steps=args.steps
    )
    grids, _ = jax.jit(
        lambda c: batched_hierarchical_grid_values(
            lambda q, cc: model.occupancy_logits(params, q, cc),
            c,
            resolution0=args.res0,
            upsampling_steps=args.steps,
            threshold=cfg.logit_threshold,
            box_size=cfg.box_size,
        )
    )(canonical)
    grids = np.asarray(grids)
    print(f"{args.batch} trained-code grids at {grids.shape[-1]}^3")

    # 1. per-grid stats, sequential
    per = []
    for i in range(args.batch):
        st = {}
        t0 = time.perf_counter()
        extract_mesh_from_grid(grids[i], cfg, stats=st)
        st["total_ms"] = (time.perf_counter() - t0) * 1e3
        per.append(st)
        print(
            f"  grid {i}: iso {st.get('iso_ms', 0):.0f} ms + simplify"
            f" {st.get('simplify_ms', 0):.0f} ms = {st['total_ms']:.0f} ms"
            f" ({st.get('faces_raw', 0)} -> {st.get('faces', 0)} faces)"
        )
    mean_ms = float(np.mean([s["total_ms"] for s in per]))
    print(f"per-grid mean {mean_ms:.0f} ms "
          f"(iso {np.mean([s.get('iso_ms',0) for s in per]):.0f},"
          f" simplify {np.mean([s.get('simplify_ms',0) for s in per]):.0f})")

    # 2. thread-pool wall time, workers 1 vs 2
    from concurrent.futures import ThreadPoolExecutor

    for w in (1, 2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=w) as pool:
            list(pool.map(
                lambda g: extract_mesh_from_grid(g, cfg), grids
            ))
        dt = time.perf_counter() - t0
        print(f"workers={w}: {dt:.2f} s total"
              f" ({dt / args.batch * 1e3:.0f} ms/grid)")

    # 3. GIL-release proof
    idle_rate, _ = spinner_progress(lambda: time.sleep(1.0))
    mesh_rate, mesh_dt = spinner_progress(
        lambda: extract_mesh_from_grid(grids[0], cfg)
    )

    def py_busy():
        t_end = time.perf_counter() + mesh_dt
        x = 0
        while time.perf_counter() < t_end:
            x += 1

    busy_rate, _ = spinner_progress(py_busy)
    released = (mesh_rate - busy_rate) / max(idle_rate - busy_rate, 1e-9)
    print(
        f"GIL-release fraction during native meshing: {released:.2f}"
        f" (spinner {mesh_rate:.2e}/s vs idle {idle_rate:.2e}/s,"
        f" python-busy floor {busy_rate:.2e}/s)"
    )
    print(
        "projection: an H-core host meshes ~H grids concurrently iff the"
        " fraction is ~1.0; per-grid cost above is the unit."
    )


if __name__ == "__main__":
    main()
