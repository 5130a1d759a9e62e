"""Pallas TPU kernel for the ICP inner iteration.

The XLA ICP path (ops/icp.py) materializes a (B, N, M) distance matrix
in HBM on EVERY iteration of the correspondence scan — at the production
operating point (64 pairs x 1024x1024, 100 iterations) that is ~50 GB of
HBM traffic for ~4 GFLOP of useful work, making ICP the dominant
non-encode stage of the headline pipeline (more_solver.py:182-188 is the
reference stage this accelerates).

This kernel fuses one full correspondence step per pair into VMEM and
returns only the sufficient statistics of the Kabsch refit:

    S        (B, 3, 3)  sum_i src_i (nn_i)^T
    nn_sum   (B, 3)     sum_i nn_i
    dmin_sum (B,)       sum_i min_j ||x_i - tgt_j||^2

where nn_i is the nearest target to the *moved* source x_i. The distance
matrix lives and dies in VMEM; per-iteration HBM traffic drops from
~8 MB/pair to ~36 KB/pair (the clouds) + 13 scalars out. The 3x3 SVD
Kabsch, the convergence freeze and the scan itself stay in XLA — they
are tiny — so the solve semantics (ops/icp.py) are unchanged.

Per-pair skip: the caller passes `active` (B,) int32 via scalar
prefetch; a pair whose flag is 0 (frozen by the convergence check) skips
the whole body under `@pl.when`, so per-iteration cost shrinks as pairs
converge. Skipped pairs' output blocks are garbage — ops/icp.py masks
every consumer with the frozen flag (it already did, for the freeze
semantics).

Cost model (measured, B=64, N=M=1024, 100-iter scan): the kernel is
MXU-bound on the (N, M)-output distance matmul at ~0.5 ms/iteration;
every VPU pass (min / compare / tie-normalize) overlaps behind it.
Input rounding: TPU DEFAULT matmul precision rounds operands to bf16,
which can flip near-tie nearest-neighbor decisions (~0.4% distance
noise). The XLA path's pairwise_sqdist carries the same rounding, the
registration metrics were validated with it, and forcing f32
(Precision.HIGHEST) measures 2.65x slower — so DEFAULT is the shipped
choice, with `exact=True` available when f32-faithful statistics
matter more than speed.

Nearest-neighbor ties are averaged (the min-mask is normalized by its
row sum) instead of argmin-first; for float point clouds ties have
measure zero. The tie count rides the nn matmul as a ones-column
(mask @ [tgt | 1]), so no separate row-sum pass runs.

nn accumulation (`vpu_acc`, measured-and-reverted): `mask @ [tgt | 1]`
is a K=M contraction feeding only 4 of the MXU's 128 output lanes, so a
variant was built that passes the target pre-transposed ([tgt^T; 1] as
an (8, M) block, computed once outside the ICP scan) and accumulates
the four rows as VPU lane-reductions of `mask * tgt_t[k]`. On chip it
measures SLOWER (30.9 vs 27.0 ms per freeze-disabled 100-iteration
B=64 solve, scripts/measure_icp.py --no-freeze): the lane-starved
matmul still pipelines behind the distance matmul better than four
extra (N, M) VPU passes do. The matmul path is the shipped default
(`tgt_t=None`); the variant is kept for A/B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _icp_stats_kernel(
    active_ref, x_ref, src_ref, tgt_ref, *rest, n: int, m: int,
    precision, vpu_acc: bool,
):
    if vpu_acc:
        tgt_t_ref, out_ref = rest
    else:
        (out_ref,) = rest
    b = pl.program_id(0)

    @pl.when(active_ref[b] != 0)
    def _body():
        x = x_ref[0]  # (N, 3) moved source
        src = src_ref[0]  # (N, 3) original source
        tgt = tgt_ref[0]  # (M, 3)

        x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
        p2 = jnp.sum(tgt * tgt, axis=-1)  # (M,)
        # Cross term on the MXU: K=3 underfills the systolic array but
        # runs concurrently with the VPU passes — measured FASTER than
        # three VPU outer products (53.8 vs 40.9 ms per 100-iteration
        # scan at B=64). x2/p2 are added in f32 on the VPU (overlapped),
        # so only the cross term carries matmul input rounding.
        d = (
            x2
            - 2.0 * jnp.dot(
                x, tgt.T,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            + p2[None, :]
        )  # (N, M); tiny negatives kept — the argmin is unaffected;
        # only dmin is clamped (an (N, 1) op) instead of the full matrix.

        dmin = jnp.min(d, axis=-1, keepdims=True)  # (N, 1)
        mask = (d <= dmin).astype(jnp.float32)  # ties included
        if vpu_acc:
            # nn accumulation as four VPU lane-reductions against the
            # pre-transposed target (module docstring): the matmul
            # alternative wastes 124/128 MXU output lanes at K=M.
            t_t = tgt_t_ref[0]  # (8, M): rows x, y, z, ones, 0-pad
            acc = jnp.concatenate(
                [
                    jnp.sum(mask * t_t[k : k + 1, :], axis=1,
                            keepdims=True)
                    for k in range(4)
                ],
                axis=1,
            )  # (N, 4)
        else:
            # nn accumulation and the tie count in ONE matmul:
            # mask @ [tgt | 1] -> (sum of tied targets | #ties) per
            # row; normalized after (mask entries are exactly 0/1 in
            # bf16).
            t_ones = jnp.concatenate(
                [tgt, jnp.ones((m, 1), jnp.float32)], axis=1
            )  # (M, 4)
            acc = jnp.dot(
                mask, t_ones,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        inv = 1.0 / acc[:, 3:4]
        nn_w = acc[:, :3] * inv  # (N, 3) tie-averaged nearest targets

        S = jax.lax.dot_general(
            src, nn_w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (3, 3) = sum_i src_i nn_i^T
        nn_sum = jnp.sum(nn_w, axis=0, keepdims=True)  # (1, 3)
        dmin_sum = jnp.sum(jnp.maximum(dmin, 0.0)).reshape(1, 1)

        out_ref[0] = jnp.concatenate(
            [
                jnp.pad(S, ((0, 0), (0, 125))),
                jnp.pad(nn_sum, ((0, 0), (0, 125))),
                jnp.pad(dmin_sum, ((0, 0), (0, 127))),
                jnp.zeros((3, 128), jnp.float32),
            ],
            axis=0,
        )


def transpose_targets(tgt: Array) -> Array:
    """Pre-transposed target block for `vpu_acc`: (B, 8, M) with rows
    [x, y, z, ones, 0-pad]. The target is constant across ICP
    iterations, so callers compute this ONCE outside the scan."""
    B, M, _ = tgt.shape
    t = jnp.swapaxes(tgt.astype(jnp.float32), -1, -2)  # (B, 3, M)
    ones = jnp.ones((B, 1, M), jnp.float32)
    pad = jnp.zeros((B, 4, M), jnp.float32)
    return jnp.concatenate([t, ones, pad], axis=1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "exact")
)
def icp_iteration_stats(
    x: Array,
    src: Array,
    tgt: Array,
    active: Array | None = None,
    tgt_t: Array | None = None,
    interpret: bool = False,
    exact: bool = False,
):
    """One fused ICP correspondence step.

    Args:
      x:   (B, N, 3) source cloud under the current transform.
      src: (B, N, 3) original source cloud (the Kabsch refit target).
      tgt: (B, M, 3) target cloud.
      active: optional (B,) int32/bool; pairs with 0 skip the body
        entirely (their outputs are garbage — mask them downstream).
      tgt_t: optional `transpose_targets(tgt)`; when given, nn
        accumulation runs as VPU lane-reductions instead of the
        4-lane-wide MXU matmul (module docstring).
      exact: force f32 matmul inputs (Precision.HIGHEST). ~2.65x slower
        at the production operating point; see module docstring.

    Returns (S (B,3,3), nn_sum (B,3), dmin_sum (B,)) as defined above.
    """
    B, N, _ = x.shape
    M = tgt.shape[1]
    if active is None:
        active = jnp.ones((B,), jnp.int32)
    precision = (
        jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    )
    vpu_acc = tgt_t is not None
    in_specs = [
        pl.BlockSpec((1, N, 3), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 3), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, 3), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [
        active.astype(jnp.int32),
        x.astype(jnp.float32),
        src.astype(jnp.float32),
        tgt.astype(jnp.float32),
    ]
    if vpu_acc:
        in_specs.append(
            pl.BlockSpec((1, 8, M), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(tgt_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _icp_stats_kernel, n=N, m=M, precision=precision,
            vpu_acc=vpu_acc,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(*inputs)
    S = out[:, :3, :3]
    nn_sum = out[:, 3, :3]
    dmin_sum = out[:, 4, 0]
    return S, nn_sum, dmin_sum
