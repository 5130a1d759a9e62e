"""A/B the bf16-decoder lever on the 400-step SE(3) refine loop.

Round 2 recorded that `refine_bf16=True` shows no effect on the dev
tunnel because its forced `--xla_allow_excess_precision` elides IN-GRAPH
`convert(f32->bf16)` around the decoder matmuls. This harness tests the
variant that flag cannot elide: decoder params pre-cast to bf16 ON HOST
and passed as jit *inputs* — the HLO parameters are then genuinely bf16
and the MXU runs its native bf16 pass (2x f32 throughput on v5e).

Three arms, each a scan of `--steps` refine gradient steps at
`--pairs` instance pairs x 1024 pts (the optim-path production regime):

  f32       params f32, queries f32            (production today)
  cast      params cast to bf16 inside the jit (round-2 arm: elidable)
  precast   params bf16 before the jit boundary (new arm)

Usage: python scripts/measure_refine_bf16.py [--pairs 64] [--steps 400]
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


def _bf16_tree(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--npts", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()

    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )
    from livingscenes_tpu.solver.registration import (
        RegistrationConfig,
        make_refine_loss,
    )

    model = ShapePrior(ShapePriorConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    src = jax.random.normal(rng, (args.pairs, args.npts, 3), jnp.float32)
    tgt = src + 0.1
    codes = jax.jit(model.encode)(params, tgt)
    R0 = jnp.broadcast_to(jnp.eye(3), (args.pairs, 3, 3))
    t0v = jnp.zeros((args.pairs, 3, 1))
    cfg = RegistrationConfig()

    def run(arm: str):
        def program(p, codes_in):
            if arm == "cast":
                p_h = _bf16_tree(p)
                decode = lambda q, c: model.decode_sdf(
                    p_h, q.astype(jnp.bfloat16), _bf16_tree(c)
                ).astype(jnp.float32)
            elif arm == "precast":
                # p arrives already bf16; queries cast at the boundary.
                decode = lambda q, c: model.decode_sdf(
                    p, q.astype(jnp.bfloat16), c
                ).astype(jnp.float32)
            else:
                decode = lambda q, c: model.decode_sdf(p, q, c)
            c_use = _bf16_tree(codes_in) if arm == "precast" else codes_in
            _, loss_fn = make_refine_loss(
                decode, src, tgt, c_use, R0, t0v, cfg
            )
            grad_fn = jax.grad(loss_fn, has_aux=True)

            def body(xi, _):
                g, _ = grad_fn(xi)
                return xi - args.lr * g, None

            xi0 = jnp.zeros((args.pairs, 6), jnp.float32)
            xi, _ = jax.lax.scan(body, xi0, None, args.steps)
            return xi

        fn = jax.jit(program)
        p_in = _bf16_tree(params) if arm == "precast" else params
        t_c = time.perf_counter()
        out = jax.block_until_ready(fn(p_in, codes))
        print(f"[{arm}] compile+first: {time.perf_counter() - t_c:.1f} s")
        t_r = time.perf_counter()
        out = jax.block_until_ready(fn(p_in, codes))
        dt = time.perf_counter() - t_r
        print(
            f"[{arm}] {args.steps} steps x {args.pairs} pairs: "
            f"{dt:.3f} s = {dt / args.steps * 1e3:.2f} ms/step   "
            f"|xi| = {float(jnp.linalg.norm(out)):.6f}"
        )
        return dt

    base = run("f32")
    for arm in ("cast", "precast"):
        d = run(arm)
        print(f"    {arm} speedup vs f32: {base / d:.2f}x")


if __name__ == "__main__":
    main()
