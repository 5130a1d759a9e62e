"""Scan-amortized ICP timing on the real TPU.

Measures the full 100-iteration ICP solve (ops/icp.py) at the headline
operating point (B=64 pairs, 1024x1024 clouds) inside one jitted
lax.scan over `reps` independent problem batches, beating the axon
tunnel's ~10 ms dispatch floor. This is the harness behind the
docs/ROOFLINE.md ICP table.

Usage:
    python scripts/measure_icp.py              # fused kernel (shipped: MXU acc)
    python scripts/measure_icp.py --vpu-acc    # fused kernel, VPU nn-acc variant
    python scripts/measure_icp.py --xla        # XLA distance-matrix path
    add --no-freeze to disable the convergence freeze (isolates
    per-iteration kernel cost; with the freeze, converging solves skip
    most iteration bodies and all variants measure alike).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--npts", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--xla", action="store_true")
    ap.add_argument("--vpu-acc", action="store_true",
                    help="fused kernel with the VPU lane-reduction "
                    "nn-accumulation (measured-and-reverted variant; "
                    "the shipped default is the MXU matmul)")
    ap.add_argument("--no-freeze", action="store_true",
                    help="disable the convergence freeze so every pair "
                    "runs all iterations (isolates per-iteration cost)")
    args = ap.parse_args()

    from livingscenes_tpu.ops import icp as icp_mod
    from livingscenes_tpu.ops.icp import iterative_closest_point

    if args.vpu_acc:
        # The solve ships tgt_t=None (MXU accumulation). Force the VPU
        # variant by shimming the kernel entry to build and pass the
        # pre-transposed target.
        import livingscenes_tpu.ops.pallas_icp as pk

        orig = pk.icp_iteration_stats

        def with_tt(x, src, tgt, active=None, tgt_t=None, **kw):
            # XLA hoists this loop-invariant transpose out of the scan.
            tt = pk.transpose_targets(tgt)
            return orig(x, src, tgt, active=active, tgt_t=tt, **kw)

        # ops/icp.py resolves the kernel from pallas_icp at call time.
        pk.icp_iteration_stats = with_tt

    rng = np.random.default_rng(0)
    B, N = args.batch, args.npts
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    # Small rigid perturbation so the solve behaves like production.
    ang = 0.1 * rng.normal(size=(B, 3)).astype(np.float32)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(ang).as_matrix().astype(np.float32)
    tgt = jnp.asarray(
        np.einsum("bij,bnj->bni", R, np.asarray(src))
        + 0.05 * rng.normal(size=(B, 1, 3)).astype(np.float32)
    )

    fused = not args.xla

    def solve(key):
        # Jitter the source per rep so XLA cannot CSE the reps.
        s = src + 1e-4 * jax.random.normal(key, src.shape, src.dtype)
        res = iterative_closest_point(
            s, tgt, max_iterations=args.iters, fused_stats=fused,
            relative_rmse_thr=0.0 if args.no_freeze else 1e-6,
        )
        return res.R.sum() + res.t.sum()

    @jax.jit
    def loop(keys):
        def body(c, k):
            return c + solve(k), None

        out, _ = jax.lax.scan(body, 0.0, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(0), args.reps)
    t0 = time.time()
    loop(keys).block_until_ready()
    print(f"compile+first: {time.time() - t0:.1f} s")
    t0 = time.time()
    loop(keys).block_until_ready()
    dt = time.time() - t0
    mode = "xla" if args.xla else (
        "fused+vpu-acc" if args.vpu_acc else "fused+mxu-acc"
    )
    print(
        f"ICP [{mode}] B={B} N={N} {args.iters} iters: "
        f"{dt / args.reps * 1e3:.2f} ms/solve ({args.reps} reps in "
        f"{dt:.2f} s)"
    )


if __name__ == "__main__":
    main()
