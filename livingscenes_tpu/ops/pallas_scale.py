"""Pallas kernel for the SIM(3) scale-initialization statistic.

The inference pre-normalization divides each cloud by the mean of the
top-5 pairwise distances (model_utils.py:165-177: torch.cdist + topk(5)
over the FULL flattened N^2 matrix — symmetric duplicates included, so
the statistic is [dmax, dmax, d2, d2, d3] for distinct values). The XLA
path materializes the (B, N, N) matrix in HBM and runs top_k over B x N^2
elements; this kernel keeps the matrix in VMEM per instance and runs 5
unrolled global max-extractions (max + first-match row/col location +
single-element mask-out — Mosaic argmax workarounds as in the FPS/kNN
kernels).

Exact semantics match (tests/test_pallas_scale.py); forward-only use
(the statistic is treated as data, like the reference's torch.no_grad
normalization).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30


def _scale_kernel(pc_ref, out_ref, *, n: int, k: int, tb: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # tb instances per grid step, one VMEM distance matrix at a time
    # (output blocking needs a sublane-multiple batch per step).
    for i in range(tb):
        pc = pc_ref[i]  # (N, 3)
        sq = jnp.sum(pc * pc, axis=-1)  # (N,)
        d2 = (
            sq[:, None]
            - 2.0 * jnp.dot(pc, pc.T, preferred_element_type=jnp.float32)
            + sq[None, :]
        )
        d = jnp.sqrt(jnp.maximum(d2, 0.0))  # (N, N)
        total = jnp.zeros((), jnp.float32)
        for _ in range(k):
            m = jnp.max(d)
            # first-match (row, col) of the max
            hit = d >= m
            r = jnp.min(jnp.where(hit, rows, jnp.int32(n)))
            c = jnp.min(
                jnp.where(hit & (rows == r), cols, jnp.int32(n))
            )
            total = total + m
            d = jnp.where((rows == r) & (cols == c), -_BIG, d)
        out_ref[i, 0] = total / k


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def top_k_mean_pairwise_distance(
    pc: Array, k: int = 5, interpret: bool = False
) -> Array:
    """Mean of the k largest entries of the full pairwise-distance matrix
    per instance. pc: (B, N, 3) (centered or not — distances are
    translation-invariant). Returns (B,)."""
    B, N, _ = pc.shape
    # The SMEM output block needs a sublane-multiple batch tile; pad the
    # batch to a multiple of 8 (zero clouds -> statistic 0, sliced off).
    tb = 8
    B_pad = -(-B // tb) * tb
    if B_pad != B:
        pc = jnp.concatenate(
            [pc, jnp.zeros((B_pad - B, N, 3), pc.dtype)], axis=0
        )
    out = pl.pallas_call(
        functools.partial(_scale_kernel, n=N, k=k, tb=tb),
        grid=(B_pad // tb,),
        in_specs=[
            pl.BlockSpec(
                (tb, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (tb, 1), lambda b: (b, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        interpret=interpret,
        # tb=8 instances x (N, N) distance tiles exceed the 16 MB default
        # scoped-vmem budget at N=1024; v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(pc.astype(jnp.float32))
    return out[:B, 0]
