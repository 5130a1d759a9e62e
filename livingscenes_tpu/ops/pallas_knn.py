"""Pallas TPU kernel for k-nearest-neighbor graph construction.

The XLA kNN path (ops/knn.py) materializes the full (B, Nq, Np) distance
matrix in HBM and runs top_k / approx_min_k over it — measured at ~92 ms
of the 142 ms production encode (7 graph builds per forward,
docs/ROUND2_NOTES.md). This kernel keeps everything in VMEM per
(instance x query tile): one MXU matmul for the distance tile, then K
unrolled min-extraction passes (Mosaic has no sort; argmin is expressed
as min + first-match iota-min, the same workaround as the FPS kernel).

The selection is EXACT (unlike approx_min_k) and sorted ascending —
pytorch3d knn_points ordering. Forward-only usage (graph indices are not
differentiated through anywhere in the framework).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30


def _knn_kernel(q_ref, p_ref, dist_ref, idx_ref, *, k: int, n_src: int):
    q = q_ref[0]  # (TQ, D)
    p = p_ref[0]  # (Np, D)
    TQ = q.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (TQ, 1)
    p2 = jnp.sum(p * p, axis=-1)  # (Np,)
    d = (
        q2
        - 2.0
        * jnp.dot(q, p.T, preferred_element_type=jnp.float32)
        + p2[None, :]
    )  # (TQ, Np)
    d = jnp.maximum(d, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, n_src), 1)
    for j in range(k):
        m = jnp.min(d, axis=-1, keepdims=True)  # (TQ, 1)
        sel = jnp.min(
            jnp.where(d <= m, col, jnp.int32(n_src)), axis=-1
        ).astype(jnp.int32)  # first occurrence of the min
        dist_ref[0, :, j] = m[:, 0]
        idx_ref[0, :, j] = sel
        d = jnp.where(col == sel[:, None], _BIG, d)


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "interpret")
)
def knn_pallas(
    query: Array,
    points: Array,
    k: int,
    tile: int = 256,
    interpret: bool = False,
):
    """Exact kNN: (dists, idx) of shape (B, Nq, k), sorted ascending.

    query: (B, Nq, D); points: (B, Np, D). Nq is padded to the tile size
    internally; D is unconstrained (the distance matmul handles it).
    """
    B, Nq, D = query.shape
    Np = points.shape[1]
    TQ = min(tile, Nq)
    pad = (-Nq) % TQ
    q = query.astype(jnp.float32)
    if pad:
        q = jnp.concatenate(
            [q, jnp.zeros((B, pad, D), jnp.float32)], axis=1
        )
    n_tiles = q.shape[1] // TQ

    dists, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_src=Np),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TQ, D), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Np, D), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TQ, k), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TQ, k), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, q.shape[1], k), jnp.float32),
            jax.ShapeDtypeStruct((B, q.shape[1], k), jnp.int32),
        ],
        interpret=interpret,
    )(q, points.astype(jnp.float32))
    return dists[:, :Nq], idx[:, :Nq]


def _knn_topk_kernel(
    q_ref, p_ref, dist_ref, idx_ref, top_ref, *, k: int, n_src: int,
    k_top: int,
):
    """_knn_kernel + per-tile top-`k_top` LARGEST distances (for the
    SIM(3) scale statistic) from the same resident distance tile.

    top_ref is one (1, n_tiles, k_top) SMEM block shared by all grid
    steps of an instance (scalar stores must target SMEM, and VMEM block
    constraints reject a (1, 1, k_top) slice); each step writes row t."""
    t_id = pl.program_id(1)
    q = q_ref[0]  # (TQ, D)
    p = p_ref[0]  # (Np, D)
    TQ = q.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)
    d = (
        q2
        - 2.0 * jnp.dot(q, p.T, preferred_element_type=jnp.float32)
        + p2[None, :]
    )  # (TQ, Np) squared
    d = jnp.maximum(d, 0.0)

    # Tile top-k_top of the squared distances (monotone in the sqrt the
    # scale statistic uses; the k_top selected values are sqrt'ed below).
    # Runs on a copy BEFORE the kNN extraction masks entries to +BIG.
    dmax = d
    for j in range(k_top):
        m = jnp.max(dmax)
        top_ref[0, t_id, j] = jnp.sqrt(m)
        # first-match mask-out of ONE cell (symmetric duplicates are
        # separate matrix entries, as in the reference's flattened topk)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TQ, n_src), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, n_src), 1)
        hit = dmax >= m
        r = jnp.min(jnp.where(hit, rows, jnp.int32(TQ)))
        c = jnp.min(jnp.where(hit & (rows == r), cols, jnp.int32(n_src)))
        dmax = jnp.where((rows == r) & (cols == c), -_BIG, dmax)

    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, n_src), 1)
    for j in range(k):
        m = jnp.min(d, axis=-1, keepdims=True)
        sel = jnp.min(
            jnp.where(d <= m, col, jnp.int32(n_src)), axis=-1
        ).astype(jnp.int32)
        dist_ref[0, :, j] = m[:, 0]
        idx_ref[0, :, j] = sel
        d = jnp.where(col == sel[:, None], _BIG, d)


@functools.partial(
    jax.jit, static_argnames=("k", "k_top", "tile", "interpret")
)
def knn_with_topk_scale(
    pc: Array,
    k: int,
    k_top: int = 5,
    tile: int = 256,
    interpret: bool = False,
):
    """Self-kNN graph + the top-`k_top`-mean pairwise-distance statistic
    from ONE pass over the distance tiles.

    The inference front end needs both on the same cloud: the scale
    init (mean of the 5 largest cdist entries, model_utils.py:175-177)
    on the centered cloud, and the layer-0 kNN graph on the normalized
    cloud — whose neighbor ORDER is identical (division by a positive
    scalar preserves argsort), so one distance computation serves both.
    pc: (B, N, 3). Returns (idx (B, N, k), scale (B,)).

    Exactness of the tiled top-k: any entry of the global top-k_top is
    within its own row-tile's top-k_top, so the global selection over
    the concatenated per-tile lists equals the full-matrix selection
    (duplicate multiplicities included).
    """
    B, N, D = pc.shape
    TQ = min(tile, N)
    assert N % TQ == 0, (N, TQ)  # padded rows would pollute the top-k
    n_tiles = N // TQ
    p = pc.astype(jnp.float32)

    _, idx, tops = pl.pallas_call(
        functools.partial(
            _knn_topk_kernel, k=k, n_src=N, k_top=k_top
        ),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TQ, D), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, D), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TQ, k), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TQ, k), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_tiles, k_top), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, n_tiles, k_top), jnp.float32),
        ],
        interpret=interpret,
    )(p, p)
    top_all, _ = jax.lax.top_k(tops.reshape(B, n_tiles * k_top), k_top)
    return idx, jnp.mean(top_all, axis=-1)
