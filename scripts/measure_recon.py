"""Scan-amortized recon-leg (hierarchical grid eval) profiling on TPU.

The end2end-with-recon device program is dominated by
`recon.grid.batched_hierarchical_grid_values` — the MISE-equivalent
coarse-to-fine occupancy-grid evaluation (the round-3 bench measured the
whole recon pipeline at 2.56 scene-pairs/s with no stage accounting;
VERDICT round-3 weak #2). This script breaks that cost into stages, each
measured as `reps` calls inside ONE jitted lax.scan (the tunnel floors
per-dispatch latency at ~10 ms — see scripts/measure_encode.py):

  full     complete hierarchical eval (dense level 0 + per-level select
           + refine decode), production settings
  dense0   level-0 dense eval alone (33^3 points/instance)
  decode   raw decoder on the same TOTAL query count as `full` — the
           pure-MXU bound of the workload
  select   `full` with a free decode (sum of coords): upsample + active
           cells + dilation + top_k + scatter machinery alone

All stage costs are shape-static (the refine cap fixes the decode count
per level), so timings are content-independent; random codes are used.
`--bf16` casts decoder params/codes/queries to bfloat16 inside the field
(accuracy A/B lives in tests/test_recon.py::test_bf16_grid_mesh_accuracy
and scripts/measure_recon.py --accuracy).

Usage:
    python scripts/measure_recon.py --stage full
    python scripts/measure_recon.py --stage decode --bf16
    python scripts/measure_recon.py --accuracy   # f32 vs bf16 mesh chamfer
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def total_queries(res0: int, steps: int, cap_factor: int) -> int:
    """Static decode count per instance of the hierarchical eval."""
    n = (res0 + 1) ** 3
    res = res0
    for _ in range(steps):
        res *= 2
        side = res + 1
        n += min(cap_factor * side * side, side**3)
    return n


def make_model_codes(batch: int, bf16: bool, seed: int = 0):
    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )

    model = ShapePrior(ShapePriorConfig())
    params = model.init_params(jax.random.PRNGKey(seed))
    pc = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (batch, 512, 3), jnp.float32
    )
    codes = model.encode(params, pc)
    # canonical frame, as the pipeline's recon stage evaluates it
    codes = dict(
        codes, s=jnp.ones_like(codes["s"]), t=jnp.zeros_like(codes["t"])
    )

    mm = jnp.bfloat16 if bf16 else None
    logits_fn = lambda q, c: model.occupancy_logits(
        params, q, c, matmul_dtype=mm
    )
    return model, params, codes, logits_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="instances (bench recon leg: 2 scenes x 8 obj)")
    ap.add_argument("--res0", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cap", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stage", default="full",
                    choices=["full", "dense0", "decode", "select"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--select", default="packsort",
                    choices=["packsort", "topk"])
    ap.add_argument("--no-dedup", dest="dedup", action="store_false",
                    help="skip exact-value tracking (counts mode: report "
                         "the larger no-dedup active set the cap must "
                         "cover)")
    ap.add_argument("--accuracy", action="store_true",
                    help="f32 vs bf16 grid -> mesh chamfer on a trained ckpt")
    ap.add_argument("--counts", action="store_true",
                    help="pre-cap active-point counts per level on trained-"
                         "checkpoint shapes (cap_factor tuning data)")
    args = ap.parse_args()

    if args.accuracy:
        return accuracy_ab(args)
    if args.counts:
        return active_counts(args)

    from livingscenes_tpu.recon.grid import (
        batched_hierarchical_grid_values,
    )

    model, params, codes, logits_fn = make_model_codes(args.batch, args.bf16)
    B = args.batch
    n_q = total_queries(args.res0, args.steps, args.cap)

    if args.stage == "decode":
        n_chunks = -(-n_q // args.chunk)
        pts = jax.random.uniform(
            jax.random.PRNGKey(2),
            (n_chunks, B, args.chunk, 3),
            jnp.float32,
            -0.55,
            0.55,
        )

        def body(c, _):
            vals = jax.lax.map(
                lambda p: logits_fn(p + c * 1e-9, codes), pts
            )
            return c + jnp.sum(vals[-1][:, :8]), None

    else:
        steps = 0 if args.stage == "dense0" else args.steps
        fn = logits_fn
        if args.stage == "select":
            fn = lambda q, c: jnp.sum(q, axis=-1)

        def body(c, _):
            perturbed = dict(codes, z_inv=codes["z_inv"] + c * 1e-9)
            values, overflow = batched_hierarchical_grid_values(
                fn,
                perturbed,
                resolution0=args.res0,
                upsampling_steps=steps,
                threshold=0.0,
                box_size=1.1,
                chunk_size=args.chunk,
                refine_cap_factor=args.cap,
                select_mode=args.select,
                dedup=args.dedup,
            )
            return c + jnp.sum(values[:, ::64, ::64, ::64]), None

    run = jax.jit(
        lambda: jax.lax.scan(body, jnp.float32(0), None, args.reps)[0]
    )
    t0 = time.perf_counter()
    float(run())
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / args.reps
    dtype = "bf16" if args.bf16 else "f32"
    print(
        f"recon [{args.stage}/{dtype}] B={B} res0={args.res0} "
        f"steps={args.steps} cap={args.cap} ({n_q} q/inst): "
        f"{dt * 1e3:.1f} ms/call "
        f"({B * n_q / dt / 1e6:.1f} Mq/s)"
    )


def _trained_canonical_codes(args, seed: int = 11):
    """(model, params, canonical codes) for `args.batch` procedural
    training-family shapes encoded with the committed trained weights —
    the field content the production recon stage actually decodes."""
    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.train.data import SyntheticShapeDataset

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "weights",
        "plateau_r4_selected.ckpt",
    )
    solver = load_solver(ckpt, fast=jax.devices()[0].platform == "tpu")
    model, params = solver.model, solver.params

    ds = SyntheticShapeDataset(n_items=1, n_pcl=512)
    rng = np.random.default_rng(seed)
    clouds = []
    for _ in range(args.batch):
        sdf = ds._shape_sdf(rng)
        clouds.append(ds._surface_points(sdf, rng, 512))
    pc = jnp.asarray(np.stack(clouds), jnp.float32)
    codes = model.encode(params, pc)
    canonical = dict(
        codes, s=jnp.ones_like(codes["s"]), t=jnp.zeros_like(codes["t"])
    )
    return model, params, canonical


def active_counts(args):
    """Pre-cap active-point counts per refine level on trained shapes.

    The refine decode costs cap_factor * (res+1)^2 points per level per
    instance whatever the content; MISE would evaluate only n_active.
    This prints n_active per level across real (trained-checkpoint)
    shapes so cap_factor can be set just above the observed maximum —
    bit-identical output as long as overflow stays 0, at
    cap_factor/24 of the round-3 refine FLOPs.
    """
    from livingscenes_tpu.recon.grid import hierarchical_grid_values

    model, params, canonical = _trained_canonical_codes(args)
    thr = 0.5
    logit_thr = float(np.log(thr) - np.log(1.0 - thr))

    def stats_one(codes_i):
        decode = lambda pts: model.occupancy_logits(
            params, pts[None], jax.tree.map(lambda x: x[None], codes_i)
        )[0]
        _, stats = hierarchical_grid_values(
            decode,
            resolution0=args.res0,
            upsampling_steps=args.steps,
            threshold=logit_thr,
            box_size=1.1,
            chunk_size=args.chunk,
            # generous cap so the counts themselves are exact
            refine_cap_factor=10 * args.cap,
            return_stats=True,
            dedup=args.dedup,
        )
        return stats["n_active"]

    counts = np.asarray(jax.jit(jax.vmap(stats_one))(canonical))
    res = args.res0
    for lvl in range(args.steps):
        res *= 2
        side = res + 1
        c = counts[:, lvl]
        print(
            f"level {lvl} (res {res}): n_active min {c.min()} "
            f"median {int(np.median(c))} max {c.max()} "
            f"-> cap_factor needed (max/side^2): "
            f"{c.max() / side / side:.1f} "
            f"(current cap {args.cap * side * side})"
        )


def accuracy_ab(args):
    """Mesh-accuracy A/B: f32 vs bf16 grids from the trained checkpoint.

    Encodes procedural training-family shapes with the committed trained
    weights, evaluates the hierarchical grid both ways, extracts meshes,
    and reports symmetric chamfer(f32 mesh, bf16 mesh) against the voxel
    size — the decision number for shipping bf16 grid decode.
    """
    from livingscenes_tpu.recon.extractor import (
        MeshExtractorConfig,
        extract_mesh_from_grid,
    )
    from livingscenes_tpu.recon.grid import batched_hierarchical_grid_values
    from livingscenes_tpu.native.bindings import KDTree

    def chamfer(a, b):
        d1, _ = KDTree(b.astype(np.float32)).query(a.astype(np.float32))
        d2, _ = KDTree(a.astype(np.float32)).query(b.astype(np.float32))
        return 0.5 * (np.mean(d1) + np.mean(d2))

    model, params, canonical = _trained_canonical_codes(args)

    f32_fn = lambda q, c: model.occupancy_logits(params, q, c)
    bf16_fn = lambda q, c: model.occupancy_logits(
        params, q, c, matmul_dtype=jnp.bfloat16
    )

    cfg = MeshExtractorConfig(
        resolution0=args.res0, upsampling_steps=args.steps
    )
    kw = dict(
        resolution0=args.res0,
        upsampling_steps=args.steps,
        threshold=cfg.logit_threshold,
        box_size=cfg.box_size,
        chunk_size=args.chunk,
        refine_cap_factor=args.cap,
    )
    g32, _ = jax.jit(
        lambda c: batched_hierarchical_grid_values(f32_fn, c, **kw)
    )(canonical)
    g16, _ = jax.jit(
        lambda c: batched_hierarchical_grid_values(bf16_fn, c, **kw)
    )(canonical)

    voxel = cfg.box_size / cfg.final_resolution
    chs = []
    for i in range(args.batch):
        m32 = extract_mesh_from_grid(np.asarray(g32[i]), cfg)
        m16 = extract_mesh_from_grid(np.asarray(g16[i]), cfg)
        if m32.is_empty or m16.is_empty:
            print(f"instance {i}: empty mesh (f32 {m32.is_empty}, "
                  f"bf16 {m16.is_empty})")
            continue
        ch = chamfer(
            m32.sample_surface(20000, seed=0),
            m16.sample_surface(20000, seed=0),
        )
        chs.append(float(ch))
        print(
            f"instance {i}: chamfer(f32, bf16) = {ch:.2e} "
            f"({ch / voxel:.3f} voxels)"
        )
    if chs:
        print(
            f"mean {np.mean(chs):.2e} ({np.mean(chs) / voxel:.3f} voxels), "
            f"max {np.max(chs):.2e} ({np.max(chs) / voxel:.3f} voxels) "
            f"[voxel = {voxel:.4f}]"
        )


if __name__ == "__main__":
    main()
