"""Farthest-point sampling as a fixed-iteration XLA program.

Replaces pytorch3d.ops.sample_farthest_points (used by the reference at
model_utils.py:205, vec_dgcnn_atten.py:169, lib_more/more_solver.py:107).

FPS is inherently sequential (K rounds of masked argmax), so we express it as
a `lax.fori_loop` carrying the running min-distance field; each round is a
fully-vectorized distance update + argmax over N, which the VPU handles well.
Supports padded (masked) inputs with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e10


def farthest_point_sampling(
    points: Array,
    k: int,
    mask: Array | None = None,
    start_idx: Array | int = 0,
):
    """Sample `k` farthest points per batch element.

    Args:
      points: (B, N, 3).
      k: number of samples (static). If fewer than k valid points exist the
        tail repeats already-selected points (matching pytorch3d's behavior
        of clamping K to the number of valid points, but with static shape).
      mask: optional (B, N) bool validity mask.
      start_idx: int or (B,) int array — index of the first selected point
        (pytorch3d uses 0 unless random_start_point=True).

    Returns:
      (sampled, idx): (B, k, 3) gathered points, (B, k) int32 indices.
    """
    B, N, _ = points.shape
    if mask is None:
        mask = jnp.ones((B, N), dtype=bool)
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    min_d = jnp.where(mask, _BIG, -_BIG)  # invalid points can never win argmax
    idx0 = start

    def body(i, carry):
        min_d, idx_acc = carry
        last = idx_acc[:, i]
        last_pt = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d = jnp.sum((points - last_pt) ** 2, axis=-1)  # (B, N)
        d = jnp.where(mask, d, -_BIG)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        idx_acc = idx_acc.at[:, i + 1].set(nxt)
        return min_d, idx_acc

    idx_acc = jnp.zeros((B, k), dtype=jnp.int32).at[:, 0].set(idx0)
    if k > 1:
        min_d, idx_acc = jax.lax.fori_loop(0, k - 1, body, (min_d, idx_acc))
    sampled = jnp.take_along_axis(points, idx_acc[..., None], axis=1)
    return sampled, idx_acc


def fps_subsample_with_features(points: Array, features: Array, factor: int):
    """FPS downsample xyz and gather aligned features.

    Mirrors the encoder's down_sample (vec_dgcnn_atten.py:163-175):
    `points` (B, N, 3) are subsampled to N // factor; `features`
    (B, N, F) are gathered at the same indices.
    """
    B, N, _ = points.shape
    k = N // factor
    sampled, idx = farthest_point_sampling(points, k)
    feats = jnp.take_along_axis(features, idx[..., None], axis=1)
    return sampled, feats, idx
