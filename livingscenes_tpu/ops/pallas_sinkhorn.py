"""VMEM-resident Sinkhorn potential iterations.

The refine loop's dominant cost (measured 21.6 of 29.7 ms/step at batch
64, docs/ROOFLINE.md) is the annealed Sinkhorn updates: XLA materializes
the (B, N, M) cost matrices in HBM and re-reads them for every softmin
update (~44 passes of 268 MB per refine step). With the implicit
(Danskin) gradient the iterates are detached anyway, so this kernel
computes the whole damped-update schedule per pair with the cost matrix
LIVING IN VMEM: inputs are just the point clouds (N x 3), outputs just
the converged potentials (N + M floats). C = 0.5|x|^2 + 0.5|y|^2 - x.y
is built once per pair from an MXU matmul; each annealing step is two
logsumexp reductions over the resident matrix. Only the final
(differentiable) extrapolation pair stays in XLA.

Shapes follow Mosaic-friendly conventions: f is carried as an (N, 1)
sublane column, g as a (1, M) lane row, so both logsumexp reductions are
native axis reductions of the (N, M) tile with no transposes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _cost_matrix(x, y):
    x2 = 0.5 * jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
    y2 = 0.5 * jnp.sum(y * y, axis=-1, keepdims=True)  # (M, 1)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)  # (N, M)
    return x2 + jnp.transpose(y2) - xy


def _lse_rows(T):  # logsumexp over lanes (axis 1) -> (N, 1)
    mx = jnp.max(T, axis=1, keepdims=True)
    return mx + jnp.log(jnp.sum(jnp.exp(T - mx), axis=1, keepdims=True))


def _lse_cols(T):  # logsumexp over sublanes (axis 0) -> (1, M)
    mx = jnp.max(T, axis=0, keepdims=True)
    return mx + jnp.log(jnp.sum(jnp.exp(T - mx), axis=0, keepdims=True))


def _potentials_kernel(x_ref, y_ref, f_ref, g_ref, *, schedule, n, m):
    x = x_ref[0]  # (N, 3)
    y = y_ref[0]  # (M, 3)
    C = _cost_matrix(x, y)

    log_a = -jnp.log(jnp.float32(n))
    log_b = -jnp.log(jnp.float32(m))

    f = jnp.zeros((n, 1), jnp.float32)
    g = jnp.zeros((1, m), jnp.float32)

    for eps in schedule:  # static python unroll (short schedule)
        inv = 1.0 / eps
        ft = -eps * _lse_rows(log_b + (g - C) * inv)  # (N, 1)
        gt = -eps * _lse_cols(log_a + (f - C) * inv)  # (1, M)
        f = 0.5 * (f + ft)
        g = 0.5 * (g + gt)

    f_ref[0] = f
    g_ref[0] = g


@functools.partial(jax.jit, static_argnames=("schedule", "interpret"))
def sinkhorn_iterates(
    x: Array, y: Array, schedule: tuple, interpret: bool = False
):
    """Damped parallel Sinkhorn iterates (f, g) for uniform-weight OT
    along a static eps `schedule` — the pre-extrapolation state of
    ops/sinkhorn._sym_potentials, computed entirely in VMEM per pair.

    x: (B, N, 3); y: (B, M, 3). Returns f (B, N), g (B, M), detached
    (the caller's implicit-gradient extrapolation differentiates only the
    final XLA softmin pair, matching geomloss).
    """
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    y = jax.lax.stop_gradient(y).astype(jnp.float32)
    B, N, _ = x.shape
    M = y.shape[1]
    f, g = pl.pallas_call(
        functools.partial(
            _potentials_kernel, schedule=tuple(schedule), n=N, m=M
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(x, y)
    return f[:, :, 0], g[:, 0, :]


# ---------------------------------------------------------------------------
# Fully-fused OT potentials: iterates + final extrapolation + closed-form VJP
# ---------------------------------------------------------------------------

def _extrapolated_kernel(
    x_ref, y_ref, fo_ref, go_ref, fi_ref, gi_ref, *, schedule, n, m
):
    """Forward: damped iterates along `schedule` then ONE undamped
    extrapolation pair (the geomloss final update). Outputs the
    extrapolated potentials (differentiated by the custom VJP below) and
    the raw iterates (residuals for the backward kernel)."""
    x = x_ref[0]
    y = y_ref[0]
    C = _cost_matrix(x, y)
    log_a = -jnp.log(jnp.float32(n))
    log_b = -jnp.log(jnp.float32(m))
    f = jnp.zeros((n, 1), jnp.float32)
    g = jnp.zeros((1, m), jnp.float32)
    for eps in schedule:
        inv = 1.0 / eps
        ft = -eps * _lse_rows(log_b + (g - C) * inv)
        gt = -eps * _lse_cols(log_a + (f - C) * inv)
        f = 0.5 * (f + ft)
        g = 0.5 * (g + gt)
    eps = schedule[-1]
    inv = 1.0 / eps
    fo = -eps * _lse_rows(log_b + (g - C) * inv)
    go = -eps * _lse_cols(log_a + (f - C) * inv)
    fo_ref[0] = fo
    go_ref[0] = go
    fi_ref[0] = f
    gi_ref[0] = g


def _extrapolated_bwd_kernel(
    x_ref, y_ref, fo_ref, go_ref, fi_ref, gi_ref, cf_ref, cg_ref,
    dx_ref, dy_ref, *, eps, n, m,
):
    """Closed-form VJP of the extrapolation pair.

    With T_f = log_b + (g_it + f_out - C)/eps the row-softmax weights are
    w_ij = exp(T_f); likewise v_ij = exp(log_a + (f_it + g_out - C)/eps)
    for the column side (the saved outputs ARE the logsumexps, so no new
    reductions are needed). The combined cotangent matrix
    M = cot_f * w + v * cot_g contracts against the point clouds:
      dx_i = (sum_j M_ij) x_i - (M y)_i
      dy_j = (sum_i M_ij) y_j - (M^T x)_j.
    """
    x = x_ref[0]
    y = y_ref[0]
    C = _cost_matrix(x, y)
    log_a = -jnp.log(jnp.float32(n))
    log_b = -jnp.log(jnp.float32(m))
    inv = 1.0 / eps
    fo = fo_ref[0]  # (N, 1)
    go = go_ref[0]  # (1, M)
    fi = fi_ref[0]  # (N, 1)
    gi = gi_ref[0]  # (1, M)
    cf = cf_ref[0]  # (N, 1)
    cg = cg_ref[0]  # (1, M)

    W = jnp.exp(log_b + (fo + gi - C) * inv)  # row-softmax of the f update
    V = jnp.exp(log_a + (fi + go - C) * inv)  # col-softmax of the g update
    Mm = cf * W + V * cg  # (N, M)

    rs = jnp.sum(Mm, axis=1, keepdims=True)  # (N, 1)
    cs = jnp.sum(Mm, axis=0, keepdims=True)  # (1, M)
    My = jnp.dot(Mm, y, preferred_element_type=jnp.float32)  # (N, 3)
    Mx = jax.lax.dot_general(
        Mm, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, 3)
    dx_ref[0] = rs * x - My
    dy_ref[0] = jnp.transpose(cs) * y - Mx


@functools.lru_cache(maxsize=None)
def _ot_core(schedule: tuple, interpret: bool):
    def fwd_call(x, y):
        B, N, _ = x.shape
        M = y.shape[1]
        return pl.pallas_call(
            functools.partial(
                _extrapolated_kernel, schedule=schedule, n=N, m=M
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, 3), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, s1, s2), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
                for s1, s2 in ((N, 1), (1, M), (N, 1), (1, M))
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, s1, s2), jnp.float32)
                for s1, s2 in ((N, 1), (1, M), (N, 1), (1, M))
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x.astype(jnp.float32), y.astype(jnp.float32))

    def bwd_call(x, y, fo, go, fi, gi, cf, cg):
        B, N, _ = x.shape
        M = y.shape[1]
        spec3 = lambda s: pl.BlockSpec((1, s, 3), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
        colspec = pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        rowspec = pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                _extrapolated_bwd_kernel, eps=schedule[-1], n=N, m=M
            ),
            grid=(B,),
            in_specs=[spec3(N), spec3(M), colspec, rowspec, colspec,
                      rowspec, colspec, rowspec],
            out_specs=(spec3(N), spec3(M)),
            out_shape=(
                jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
                jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x.astype(jnp.float32), y.astype(jnp.float32),
          fo, go, fi, gi, cf, cg)

    @jax.custom_vjp
    def core(x, y):
        fo, go, _, _ = fwd_call(x, y)
        return fo[:, :, 0], go[:, 0, :]

    def fwd(x, y):
        fo, go, fi, gi = fwd_call(x, y)
        return (fo[:, :, 0], go[:, 0, :]), (x, y, fo, go, fi, gi)

    def bwd(res, cots):
        x, y, fo, go, fi, gi = res
        cf, cg = cots
        dx, dy = bwd_call(
            x, y, fo, go, fi, gi, cf[:, :, None], cg[:, None, :]
        )
        return dx.astype(x.dtype), dy.astype(y.dtype)

    core.defvjp(fwd, bwd)
    return core


@functools.partial(jax.jit, static_argnames=("schedule", "interpret"))
def ot_extrapolated_potentials(
    x: Array, y: Array, schedule: tuple, interpret: bool = False
):
    """Extrapolated Sinkhorn potentials (f, g) for OT(x, y), uniform
    weights — the full geomloss forward fused in VMEM, with a closed-form
    softmax-weight VJP (also a Pallas kernel). Cost matrices never touch
    HBM in either direction. x: (B, N, 3), y: (B, M, 3);
    returns f (B, N), g (B, M)."""
    return _ot_core(tuple(schedule), interpret)(x, y)
