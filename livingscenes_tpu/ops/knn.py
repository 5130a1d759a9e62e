"""TPU-native k-nearest-neighbor search.

Replaces pytorch3d.ops.knn_points (used by the reference encoder at
lib_shape_prior/core/lib/vec_sim3/vec_dgcnn_atten.py:139-151) with a batched,
matmul-based distance computation that maps onto the MXU, followed by an
approx-free top-k. Everything is fixed-shape and jit/vmap friendly; invalid
(padded) points are handled with masks rather than dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e10


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """Squared Euclidean distances between (..., N, D) and (..., M, D).

    Uses |a|^2 + |b|^2 - 2 a.b so the dominant cost is a single batched
    matmul on the MXU (instead of materializing (N, M, D) differences).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2))  # (..., N, M)
    d = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def knn(
    query: Array,
    points: Array,
    k: int,
    query_mask: Array | None = None,
    points_mask: Array | None = None,
    approx: bool = False,
    recall_target: float = 0.95,
):
    """k nearest neighbors of `query` within `points`.

    Args:
      query: (..., N, D).
      points: (..., M, D).
      k: number of neighbors (static).
      query_mask: optional (..., N) bool; invalid queries get neighbor 0.
      points_mask: optional (..., M) bool; invalid points are never selected
        (as long as at least k valid points exist).
      approx: use the TPU-native partial-reduction `lax.approx_min_k`
        instead of a full sort — ~3x faster at measured recall ~0.99 with
        recall_target=0.95. Appropriate for kNN *graph* construction where
        downstream aggregation is neighbor-order-invariant.

    Returns:
      (dists, idx): (..., N, k) squared distances and int32 indices, sorted
      ascending (exact mode) — matching pytorch3d knn_points ordering.
    """
    d = pairwise_sqdist(query, points)
    if points_mask is not None:
        d = jnp.where(points_mask[..., None, :], d, _BIG)
    if approx and d.shape[-1] > 2 * k:
        dists, idx = jax.lax.approx_min_k(d, k, recall_target=recall_target)
    else:
        # top_k on negated distances gives the k smallest, sorted.
        neg_d, idx = jax.lax.top_k(-d, k)
        dists = -neg_d
    if query_mask is not None:
        idx = jnp.where(query_mask[..., None], idx, 0)
        dists = jnp.where(query_mask[..., None], dists, 0.0)
    return dists, idx.astype(jnp.int32)


def gather_neighbors(features: Array, idx: Array) -> Array:
    """Gather per-point neighbor features.

    Args:
      features: (B, M, F) source features.
      idx: (B, N, K) int indices into M.
    Returns:
      (B, N, K, F).
    """
    return jnp.take_along_axis(
        features[:, None, :, :],
        idx[..., None].astype(jnp.int32),
        axis=2,
    )


def gather_neighbors_onehot(features: Array, idx: Array) -> Array:
    """Neighbor gather as a one-hot matmul — the MXU does the gathering.

    XLA's TPU gather runs at ~20 GB/s effective (measured on v5e); routing
    the same gather through a (N*K, M) one-hot times (M, F) matmul reaches
    ~3.5x that at DGCNN sizes. Values are reproduced up to f32-matmul
    rounding (the MXU's bf16x3 decomposition), ~1e-7 relative.

    features: (B, M, F); idx: (B, N, K) -> (B, N, K, F).
    """
    B, M, F = features.shape
    _, N, K = idx.shape
    flat_idx = idx.reshape(B, N * K)
    onehot = (
        flat_idx[..., None] == jnp.arange(M, dtype=flat_idx.dtype)[None, None]
    ).astype(features.dtype)
    out = jnp.einsum(
        "bqm,bmf->bqf", onehot, features,
        preferred_element_type=features.dtype,
    )
    return out.reshape(B, N, K, F)
