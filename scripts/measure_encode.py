"""Scan-amortized encode-path timing on the real TPU.

The axon tunnel floors every jit dispatch at ~10 ms, so single-call
kernel timings are meaningless (verify-skill caveat). This script wraps
`reps` encoder calls in ONE jitted lax.scan and reports per-call time,
which is how the ROOFLINE.md encode-profile numbers were measured.

Usage:
    python scripts/measure_encode.py              # production 128x1024
    python scripts/measure_encode.py --xla        # XLA (non-Pallas) path
    python scripts/measure_encode.py --train      # train-step fwd+bwd
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--npts", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--xla", action="store_true", help="non-Pallas build")
    ap.add_argument("--train", action="store_true", help="fwd+bwd train loss")
    ap.add_argument("--bf16-decoder", action="store_true",
                    help="with --train: bf16 decoder matmuls (decoder_bf16)")
    ap.add_argument(
        "--fps",
        action="store_true",
        help="time the FPS kernel alone (use --tile to sweep batch tiles)",
    )
    ap.add_argument("--tile", type=int, default=0, help="FPS batch tile")
    ap.add_argument("--k", type=int, default=512, help="FPS sample count")
    ap.add_argument("--unroll", type=int, default=8,
                    help="FPS selection-loop unroll factor")
    args = ap.parse_args()

    if args.fps:
        from livingscenes_tpu.ops.pallas_fps import fps_pallas

        key = jax.random.PRNGKey(1)
        pc = jax.random.normal(
            key, (args.batch, args.npts, 3), jnp.float32
        )
        tile = args.tile or 32

        def body(c, _):
            _, idx = fps_pallas(
                pc + c * 1e-9, args.k, batch_tile=tile, unroll=args.unroll
            )
            return c + jnp.float32(jnp.sum(idx)), None

        fn = jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), None, args.reps)[0]
        )
        t0 = time.perf_counter()
        float(fn())
        print(f"compile+first: {time.perf_counter() - t0:.1f} s")
        t0 = time.perf_counter()
        float(fn())
        dt = time.perf_counter() - t0
        print(
            f"fps tile={tile} unroll={args.unroll} "
            f"{args.batch}x{args.npts}->{args.k}: "
            f"{dt / args.reps * 1e3:.2f} ms/call"
        )
        return

    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )

    cfg = ShapePriorConfig(pallas_attention=not args.xla)
    model = ShapePrior(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    pc = jax.random.normal(key, (args.batch, args.npts, 3), jnp.float32)

    if args.train:
        from livingscenes_tpu.models.sim3recon import SIM3Recon, TrainLossConfig

        m2 = SIM3Recon(
            cfg, TrainLossConfig(decoder_bf16=args.bf16_decoder)
        )
        p2 = m2.init_params(jax.random.PRNGKey(0))
        q = jax.random.normal(key, (args.batch, args.npts, 3), jnp.float32)
        sdf = jax.random.normal(key, (args.batch, args.npts), jnp.float32)
        batch = {
            "inputs": pc,
            "points_uni": q,
            "points_uni_value": sdf,
            "points_nss": q,
            "points_nss_value": sdf,
        }

        def loss_fn(p):
            loss, _ = m2.loss(p, batch, jax.random.PRNGKey(2), train=True)
            return loss

        def body(c, _):
            g = jax.grad(loss_fn)(p2)
            s = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return c + s, None

        fn = jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), None, args.reps)[0]
        )
    else:

        def body(c, _):
            codes = model.encode(params, pc + c * 1e-9)
            return c + jnp.sum(codes["z_inv"]), None

        fn = jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), None, args.reps)[0]
        )

    t0 = time.perf_counter()
    float(fn())  # compile + first run
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    float(fn())
    dt = time.perf_counter() - t0
    label = "train fwd+bwd" if args.train else "encode"
    path = "xla" if args.xla else "pallas"
    print(
        f"{label} [{path}] {args.batch}x{args.npts}: "
        f"{dt / args.reps * 1e3:.2f} ms/call ({args.reps} reps in {dt:.2f} s)"
    )


if __name__ == "__main__":
    main()
