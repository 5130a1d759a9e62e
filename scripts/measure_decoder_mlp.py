"""Standalone roofline micro-benchmark of the DeepSDF decoder MLP.

Pins down what bounds the recon decode stage (VERDICT r4 missing #3 /
weak #1): the 9-matmul weight-norm MLP (513->768x8->1, latent
re-injection at layer 4) evaluated over large query batches, exactly as
`recon.grid` does via chunked `occupancy_logits`. Reports ms/call and
achieved TFLOP/s for f32 vs bf16 params/activations at several chunk
sizes, so the f32-vs-bf16 parity (measured 20.4 Mq/s BOTH, r5) can be
attributed: if f32 == bf16 at identical achieved TFLOP/s near the bf16
peak, XLA's DEFAULT-precision bf16 passes already run the f32 path at
bf16 speed and there is no dtype win left — only fusion (VMEM-resident
activations) can move it.

    python scripts/measure_decoder_mlp.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def mlp_flops_per_row() -> int:
    """Exact MAC*2 count of the production decoder (nn/deepsdf.py)."""
    dims = [513] + [768] * 8 + [1]
    total = 0
    for layer in range(9):
        out_d = dims[layer + 1] - (513 if layer + 1 == 4 else 0)
        in_d = dims[layer] if layer != 4 else 768  # concat back to 768
        total += in_d * out_d
    return 2 * total


def main():
    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )

    model = ShapePrior(ShapePriorConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    dec_params = params["decoder"]
    flops_row = mlp_flops_per_row()
    print(f"decoder FLOPs/row: {flops_row / 1e6:.2f} M")

    B = 16
    reps = 4
    for chunk in (4096, 16384):
        rows = B * chunk
        for dtype in ("f32", "bf16"):
            if dtype == "bf16":
                p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32
                    else a,
                    dec_params,
                )
                xdt = jnp.bfloat16
            else:
                p, xdt = dec_params, jnp.float32

            # Inputs are generated ON DEVICE inside the jit: closing over a
            # host array bakes a (B, chunk, 513) constant into the HLO and
            # the tunneled remote_compile rejects the upload (HTTP 413).
            def fn_impl(params):
                x = jax.random.normal(
                    jax.random.PRNGKey(1), (B, chunk, 513), jnp.float32
                ).astype(xdt)

                def body(c, _):
                    out = model.decoder.apply(
                        {"params": params}, x + c.astype(x.dtype)
                    )
                    return c + jnp.float32(jnp.sum(out[:, :8])), None

                return jax.lax.scan(body, jnp.float32(0), None, reps)[0]

            fn = jax.jit(fn_impl)
            float(fn(p))  # compile + first
            t0 = time.perf_counter()
            float(fn(p))
            dt = (time.perf_counter() - t0) / reps
            tf = rows * flops_row / dt / 1e12
            print(
                f"mlp [{dtype}] B={B} chunk={chunk}: {dt * 1e3:.2f} ms/call"
                f"  {rows / dt / 1e6:.1f} Mrow/s  {tf:.1f} TFLOP/s"
            )


if __name__ == "__main__":
    main()
