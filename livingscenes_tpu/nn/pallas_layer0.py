"""Fused Pallas kernel for the encoder's layer-0 cross-product edge conv.

Layer 0 of VecDGCNN_att builds, per edge, the 3-channel vector feature
[cross(dst_dir, nn), nn - dst, dst] (vec_dgcnn_atten.py:154-160) and
mean-pools a VecLNA(3, O) over the K neighbors. The XLA path pays a slow
5-D take_along_axis gather plus a materialized (B, N, K, O, 3) edge
tensor (measured 29 ms of the 109 ms encode at 128x1024 — the single
largest stage, docs/ROOFLINE.md). Here the entire layer runs per
(instance x dst tile) in VMEM:

* ONE one-hot MXU matmul gathers all three xyz components at once
  ((E, N_src) @ (N_src, 3)); per-component columns are separated by
  mask-multiply row sums (no single-lane slices).
* Because every edge channel is linear in (nn, dst, dst_dir), the edge
  conv is expressed as broadcasts against the three weight ROWS:
  y_i = (dhat_j nn_k - dhat_k nn_j) w_cross + (nn_i - dst_i) w_left
        + dst_i w_right  — pure VPU, no edge tensor ever materialized.
* VecActivation + mean over K reuse the shared helpers from
  nn/pallas_attention.py, including the custom-VJP backward pattern
  (recompute-in-backward; source grads via the transposed one-hot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import (
    _int_zero_cot,
    _vec_act_backward,
    _vec_act_forward,
)

Array = jax.Array


def _edge_terms(src_ref, dst_ref, idx_ref, w_ref, n_src, k):
    """Shared forward recompute: per-component y_i (E, O) plus the raw
    per-edge scalars needed by the backward."""
    TN = idx_ref.shape[1]
    E = TN * k

    src_iota = jax.lax.broadcasted_iota(jnp.int32, (TN, k, n_src), 2)
    onehot = (
        (src_iota == idx_ref[0][..., None]).astype(jnp.float32)
    ).reshape(E, n_src)
    nn_all = jnp.dot(
        onehot, src_ref[0], preferred_element_type=jnp.float32
    )  # (E, 3)

    comp_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)

    def col(mat, i):  # (R, 3) -> (R, 1) column i without lane slicing
        mask = (comp_iota == i).astype(jnp.float32)
        return jnp.sum(mat * mask, axis=1, keepdims=True)

    dst = dst_ref[0]  # (TN, 3)
    dnorm = jnp.sqrt(jnp.sum(dst * dst, axis=1, keepdims=True))
    dhat = dst / jnp.maximum(dnorm, 1e-12)

    def rep(x):  # (TN, 1) -> (E, 1)
        return jnp.broadcast_to(x[:, None, :], (TN, k, 1)).reshape(E, 1)

    nn = [col(nn_all, i) for i in range(3)]
    dc = [rep(col(dst, i)) for i in range(3)]
    dh = [rep(col(dhat, i)) for i in range(3)]

    w = w_ref[:]  # (3, O): rows [cross, left(nn - dst), right(dst)]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)

    def row(i):  # (1, O) row i via mask-sum (no sublane slice)
        mask = (sub_iota == i).astype(jnp.float32)
        return jnp.sum(w * mask, axis=0, keepdims=True)

    wc, wl, wr = row(0), row(1), row(2)
    cross = [
        dh[1] * nn[2] - dh[2] * nn[1],
        dh[2] * nn[0] - dh[0] * nn[2],
        dh[0] * nn[1] - dh[1] * nn[0],
    ]
    y = [
        cross[i] * wc + (nn[i] - dc[i]) * wl + dc[i] * wr for i in range(3)
    ]
    return y, (onehot, nn_all, nn, dc, dh, dnorm, cross, wc, wl, wr)


def _layer0_kernel(
    src_ref,   # (1, N_src, 3)
    dst_ref,   # (1, TN, 3)
    idx_ref,   # (1, TN, K)
    w_ref,     # (3, O)
    d_ref,     # (O, O)
    out_ref,   # (1, 3, TN, O)
    *,
    n_src: int,
    c_out: int,
    k: int,
    neg_slope: float,
):
    TN = idx_ref.shape[1]
    y, _ = _edge_terms(src_ref, dst_ref, idx_ref, w_ref, n_src, k)
    msg, _ = _vec_act_forward(y, d_ref[:], neg_slope)
    for i in range(3):
        out_ref[0, i] = jnp.mean(
            msg[i].reshape(TN, k, c_out), axis=1
        )


def _layer0_bwd_kernel(
    src_ref,   # (1, N_src, 3)
    dst_ref,   # (1, TN, 3)
    idx_ref,   # (1, TN, K)
    w_ref,     # (3, O)
    d_ref,     # (O, O)
    g_ref,     # (1, 3, TN, O)
    dsrc_ref,  # out (1, N_src, 3)   accumulated over dst tiles
    ddst_ref,  # out (1, TN, 3)
    dw_ref,    # out (3, O)          accumulated over batch + tiles
    dd_ref,    # out (O, O)          accumulated over batch + tiles
    *,
    n_src: int,
    c_out: int,
    k: int,
    neg_slope: float,
):
    TN = idx_ref.shape[1]
    E = TN * k
    O = c_out
    b = pl.program_id(0)
    t = pl.program_id(1)

    y, res = _edge_terms(src_ref, dst_ref, idx_ref, w_ref, n_src, k)
    onehot, nn_all, nn, dc, dh, dnorm, cross, wc, wl, wr = res
    _, act_res = _vec_act_forward(y, d_ref[:], neg_slope)

    inv_k = 1.0 / jnp.float32(k)
    g = [
        jnp.broadcast_to(g_ref[0, i][:, None, :], (TN, k, O)).reshape(E, O)
        * inv_k
        for i in range(3)
    ]
    d_y, d_d = _vec_act_backward(g, y, d_ref[:], act_res, neg_slope)

    # y_i = cross_i wc + (nn_i - dc_i) wl + dc_i wr
    d_cross = [jnp.sum(d_y[i] * wc, axis=1, keepdims=True) for i in range(3)]
    d_nn = [jnp.sum(d_y[i] * wl, axis=1, keepdims=True) for i in range(3)]
    d_dc = [
        jnp.sum(d_y[i] * (wr - wl), axis=1, keepdims=True) for i in range(3)
    ]
    d_wc = sum(
        jnp.sum(cross[i] * d_y[i], axis=0, keepdims=True) for i in range(3)
    )
    d_wl = sum(
        jnp.sum((nn[i] - dc[i]) * d_y[i], axis=0, keepdims=True)
        for i in range(3)
    )
    d_wr = sum(
        jnp.sum(dc[i] * d_y[i], axis=0, keepdims=True) for i in range(3)
    )

    # cross terms: cross_i = dh_j nn_k - dh_k nn_j (cyclic)
    d_dh = [jnp.zeros((E, 1), jnp.float32) for _ in range(3)]
    for i, (j, kk) in enumerate(((1, 2), (2, 0), (0, 1))):
        d_dh[j] = d_dh[j] + d_cross[i] * nn[kk]
        d_nn[kk] = d_nn[kk] + d_cross[i] * dh[j]
        d_dh[kk] = d_dh[kk] - d_cross[i] * nn[j]
        d_nn[j] = d_nn[j] - d_cross[i] * dh[kk]

    # scatter nn grads back to sources: build (E, 3) then onehot^T matmul
    comp_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)
    d_nn_all = sum(
        d_nn[i] * (comp_iota == i).astype(jnp.float32) for i in range(3)
    )  # (E, 3)
    dsrc = jnp.dot(
        onehot.T, d_nn_all, preferred_element_type=jnp.float32
    )  # (N_src, 3)

    # dst grads: sum per-edge columns over K, plus dhat normalize backward
    def unrep(x):  # (E, 1) -> (TN, 1)
        return jnp.sum(x.reshape(TN, k, 1), axis=1)

    d_dst_cols = [unrep(d_dc[i]) for i in range(3)]
    d_dhat_cols = [unrep(d_dh[i]) for i in range(3)]
    d_dst_mat = sum(
        d_dst_cols[i] * (comp_iota == i).astype(jnp.float32)
        for i in range(3)
    )  # (TN, 3)
    d_dhat = sum(
        d_dhat_cols[i] * (comp_iota == i).astype(jnp.float32)
        for i in range(3)
    )  # (TN, 3)
    # dhat = dst / max(|dst|, eps)
    dst = dst_ref[0]
    m = jnp.maximum(dnorm, 1e-12)
    inv = 1.0 / m
    dot = jnp.sum(d_dhat * dst, axis=1, keepdims=True)
    live = (dnorm > 1e-12).astype(jnp.float32)
    d_dst_mat = d_dst_mat + d_dhat * inv - dst * (
        dot * inv * inv * inv * live
    )
    ddst_ref[0] = d_dst_mat

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    dw_acc = (
        d_wc * (sub_iota == 0).astype(jnp.float32)
        + d_wl * (sub_iota == 1).astype(jnp.float32)
        + d_wr * (sub_iota == 2).astype(jnp.float32)
    )  # (3, O)

    @pl.when(t == 0)
    def _():
        dsrc_ref[0] = dsrc

    @pl.when(t != 0)
    def _():
        dsrc_ref[0] = dsrc_ref[0] + dsrc

    first = (b == 0) & (t == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = dw_acc
        dd_ref[:] = d_d

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw_acc
        dd_ref[:] = dd_ref[:] + d_d


def _l0_tile(n_dst: int, n_src: int, k: int, c_out: int, factor: int) -> int:
    budget = 6 * 1024 * 1024
    tn = 256
    while tn > 8:
        e = tn * k
        working = factor * 4 * e * (n_src + 8 * c_out + 16)
        if working <= budget and n_dst % tn == 0:
            break
        tn //= 2
    while n_dst % tn and tn > 1:
        tn //= 2
    return max(tn, 1)


def _l0_specs(N_src, TN, K, O):
    return [
        pl.BlockSpec((1, N_src, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TN, 3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    ]


def _l0_fwd_impl(xyz, idx, W, D, neg_slope, interpret, tile):
    B, N, _ = xyz.shape
    K = idx.shape[-1]
    O = W.shape[0]
    TN = tile or _l0_tile(N, N, K, O, 1)
    if N % TN:  # grid (B, N // TN) would silently drop the tail rows
        raise ValueError(f"tile {TN} must divide the point count {N}")
    out3 = pl.pallas_call(
        functools.partial(
            _layer0_kernel, n_src=N, c_out=O, k=K, neg_slope=neg_slope
        ),
        grid=(B, N // TN),
        in_specs=_l0_specs(N, TN, K, O),
        out_specs=pl.BlockSpec(
            (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, N, O), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        xyz.astype(jnp.float32),
        xyz.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W).astype(jnp.float32),
        jnp.transpose(D).astype(jnp.float32),
    )
    return jnp.transpose(out3, (0, 2, 3, 1))  # (B, N, O, 3)


def _l0_bwd_impl(xyz, idx, W, D, g, neg_slope, interpret, tile):
    B, N, _ = xyz.shape
    K = idx.shape[-1]
    O = W.shape[0]
    TN = tile or _l0_tile(N, N, K, O, 2)
    if N % TN:  # grid (B, N // TN) would silently drop the tail rows
        raise ValueError(f"tile {TN} must divide the point count {N}")
    g3 = jnp.transpose(g, (0, 3, 1, 2))
    d_src, d_dst, d_w_t, d_d_t = pl.pallas_call(
        functools.partial(
            _layer0_bwd_kernel, n_src=N, c_out=O, k=K, neg_slope=neg_slope
        ),
        grid=(B, N // TN),
        in_specs=_l0_specs(N, TN, K, O) + [
            pl.BlockSpec((1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, O), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, O), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, O), jnp.float32),
            jax.ShapeDtypeStruct((O, O), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        xyz.astype(jnp.float32),
        xyz.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W).astype(jnp.float32),
        jnp.transpose(D).astype(jnp.float32),
        g3.astype(jnp.float32),
    )
    d_xyz = (d_src + d_dst).astype(xyz.dtype)
    d_W = jnp.transpose(d_w_t).astype(W.dtype)
    d_D = jnp.transpose(d_d_t).astype(D.dtype)
    return d_xyz, d_W, d_D


@functools.lru_cache(maxsize=None)
def _l0_core(neg_slope: float, interpret: bool, tile):
    @jax.custom_vjp
    def core(xyz, idx, W, D):
        return _l0_fwd_impl(xyz, idx, W, D, neg_slope, interpret, tile)

    def fwd(xyz, idx, W, D):
        out = _l0_fwd_impl(xyz, idx, W, D, neg_slope, interpret, tile)
        return out, (xyz, idx, W, D)

    def bwd(res, g):
        xyz, idx, W, D = res
        d_xyz, d_W, d_D = _l0_bwd_impl(
            xyz, idx, W, D, g, neg_slope, interpret, tile
        )
        return d_xyz, _int_zero_cot(idx), d_W, d_D

    core.defvjp(fwd, bwd)
    return core


@functools.partial(
    jax.jit, static_argnames=("neg_slope", "interpret", "tile")
)
def fused_layer0_edge_mean(
    xyz: Array,  # (B, N, 3) point coordinates (src == dst at layer 0)
    idx: Array,  # (B, N, K) kNN indices
    W: Array,    # (O, 3) VecLNA lin weight over [cross, nn - dst, dst]
    D: Array,    # (O, O) activation direction weight
    neg_slope: float = 0.2,
    interpret: bool = False,
    tile: int | None = None,
) -> Array:
    """Fused layer-0 cross-product edge conv; returns (B, N, O, 3).
    Equals mean_K(VecLNA(3, O)([cross(dst_dir, nn), nn - dst, dst])) up
    to f32 rounding (vec_dgcnn_atten.py:154-160 + the V_0 VecLNA).
    Differentiable via the fused backward kernel."""
    return _l0_core(neg_slope, interpret, tile)(xyz, idx, W, D)
