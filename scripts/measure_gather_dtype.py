"""Probe: does a bf16 one-hot gather matmul beat the f32 default in-kernel?

The fused encode kernels route every neighbor gather through one-hot
matmuls whose one-hot operand is built *inside* the kernel from the kNN
indices (nn/pallas_attention.py:164-172 and friends) — it never touches
HBM. With f32 operands the MXU runs a multi-pass bf16 decomposition;
bf16 operands run one pass. The one-hot itself is 0/1 (bf16-exact), so
the only accuracy cost is rounding the gathered VALUES to bf16.

This measures a minimal Pallas kernel with exactly that structure
(in-VMEM one-hot from an idx tile, matmul against a VMEM-resident flat
source) at the production mean-edge gather shape, to decide whether an
`encode_bf16` knob is worth building.

Run on the TPU: python scripts/measure_gather_dtype.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Production gather shape per (instance, dst tile): the mean-edge layer at
# 1024 pts, K=16 -> E = N*K edge rows, flat source (1024, 3*32).
E, M, F = 1024 * 16, 1024, 96
TE = 2048  # edge rows per tile (VMEM: onehot TE x M f32 = 8 MB)
B = 32  # instances per timing batch
REPS = 5
SCAN_LEN = 50


def _time(fn, *args):
    # The axon tunnel's block_until_ready does not actually block; force
    # completion by pulling a scalar to host (measure_encode.py pattern).
    out = float(jnp.sum(fn(*args)).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = float(jnp.sum(fn(*args)).astype(jnp.float32))
    return (time.perf_counter() - t0) / REPS * 1e3, out


def _make_gather(dtype):
    def kernel(i_ref, s_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (TE, M), 1)
        onehot = (iota == i_ref[:]).astype(dtype)
        out_ref[:] = jnp.dot(
            onehot, s_ref[:].astype(dtype), preferred_element_type=jnp.float32
        )

    def one(idx, s):
        return pl.pallas_call(
            kernel,
            grid=(E // TE,),
            in_specs=[
                pl.BlockSpec((TE, 1), lambda i: (i, 0)),
                pl.BlockSpec((M, F), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TE, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
        )(idx, s)

    def scanned(idx, src):
        def body(acc, _):
            out = jax.vmap(one)(idx, src + acc[:, :M, :])
            return out, ()

        init = jnp.zeros((B, E, F), jnp.float32)
        acc, _ = jax.lax.scan(body, init, None, length=SCAN_LEN)
        return acc

    return jax.jit(scanned)


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (B, E, 1), 0, M, jnp.int32)
    src = jax.random.normal(key, (B, M, F), jnp.float32)

    flops = 2 * E * M * F * B * SCAN_LEN  # per scan invocation
    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        fn = _make_gather(dt)
        ms, out = _time(fn, idx, src)
        outs[jnp.dtype(dt).name] = out
        print(
            f"in-kernel onehot {jnp.dtype(dt).name:9s} {ms:8.3f} ms "
            f"-> {flops / (ms / 1e3) / 1e12:7.2f} TFLOP/s"
        )
    # Gather is a selection: bf16 rounds values only where src itself
    # needs >8 mantissa bits; report the checksum drift for context.
    print(f"checksum f32={outs['float32']:.6g} bf16={outs['bfloat16']:.6g}")


if __name__ == "__main__":
    main()
