"""Pallas TPU kernel for farthest-point sampling.

The XLA `lax.fori_loop` FPS (ops/fps.py) pays per-iteration loop overhead
(~160us/step observed on v5e) because every step is scheduled against HBM.
This kernel keeps the point block and the running min-distance field
resident in VMEM and runs all K selection steps inside one kernel program.

Layout notes (v5e lanes are 128-wide):
* points are carried as (TB, 3, N) so the point axis N sits in the lane
  dimension — every elementwise/reduce op is lane-aligned,
* "gather the last selected point" is a one-hot multiply + lane reduction
  (Mosaic has no per-row dynamic gather),
* selected indices accumulate in a (TB, K) carry via one-hot select and are
  stored once (dynamic lane-offset stores are unsupported).

Semantics match ops/fps.py exactly (start index 0, masked invalid points
never selected); tests cross-check the two implementations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30


def _fps_kernel(pts_ref, mask_ref, idx_ref, *, k: int, unroll: int = 4):
    pts = pts_ref[:]  # (TB, 3, N)
    valid = mask_ref[:]  # (TB, N) int32
    TB = pts.shape[0]
    N = pts.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (TB, k), 1)

    def step(pos, carry):
        """One selection round; pos is the idx_acc column being written."""
        mind, cur, idx_acc = carry
        onehot = (col == cur[:, None]).astype(jnp.float32)  # (TB, N)
        # One-hot multiply-reduce gather (measured faster than a fused
        # where-select over (TB, 3, N), which materializes a broadcast
        # mask). The distance stays in the (p - last)^2 form on purpose:
        # the dot-product form |p|^2 - 2 p.last + |last|^2 rounds
        # differently, which breaks exact index equality with ops/fps.py
        # at near-ties and makes the selected point's own distance
        # +/-eps instead of exactly 0 (wrong tail behavior when fewer
        # than k valid points exist).
        last = jnp.sum(pts * onehot[:, None, :], axis=2)  # (TB, 3)
        d = jnp.sum((pts - last[:, :, None]) ** 2, axis=1)  # (TB, N)
        # Invalid points are baked into mind0 at -2*_BIG; d >= 0, so the
        # running minimum keeps them below every valid score forever and
        # no per-round penalty add is needed.
        mind = jnp.minimum(mind, d)
        # argmax via max + first-match iota-min (Mosaic's argmax lowering
        # miscompiles at some lane counts, e.g. N = 128).
        m = jnp.max(mind, axis=-1, keepdims=True)
        nxt = jnp.min(
            jnp.where(mind >= m, col, jnp.int32(N)), axis=-1
        ).astype(jnp.int32)
        idx_acc = jnp.where(col_k == pos, nxt[:, None], idx_acc)
        return mind, nxt, idx_acc

    # Manual unroll: Mosaic's per-iteration loop machinery costs far more
    # than the round's VPU work (~9 us vs ~100 cycles measured at
    # 64x4096), and its scan lowering only supports unroll=1|full. The
    # body therefore runs `unroll` selection rounds per trip; rounds past
    # k-1 in the final trip are harmless (their idx_acc write targets a
    # column >= k, which doesn't exist, and extra mind updates only
    # re-select already-known-far points into dead columns).
    def body(i, carry):
        for j in range(unroll):
            carry = step(i * unroll + j + 1, carry)
        return carry

    mind0 = jnp.where(valid > 0, _BIG, -2.0 * _BIG).astype(jnp.float32)
    cur0 = jnp.zeros((TB,), jnp.int32)
    idx0 = jnp.zeros((TB, k), jnp.int32)
    trips = -(-(k - 1) // unroll)
    _, _, idx_acc = jax.lax.fori_loop(0, trips, body, (mind0, cur0, idx0))
    idx_ref[:] = idx_acc


@functools.partial(
    jax.jit, static_argnames=("k", "batch_tile", "interpret", "unroll")
)
def fps_pallas(
    points: Array,
    k: int,
    mask: Array | None = None,
    batch_tile: int = 8,
    interpret: bool = False,
    unroll: int = 4,
):
    """Farthest-point sampling via the Pallas kernel.

    points: (B, N, 3) float32. Returns (sampled (B, k, 3), idx (B, k)).
    B must be a multiple of batch_tile (pad externally otherwise).
    """
    B, N, _ = points.shape
    assert B % batch_tile == 0, (B, batch_tile)
    if mask is None:
        mask_i = jnp.ones((B, N), jnp.int32)
    else:
        mask_i = mask.astype(jnp.int32)
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # (B, 3, N)

    idx = pl.pallas_call(
        functools.partial(_fps_kernel, k=k, unroll=unroll),
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec(
                (batch_tile, 3, N), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, k), jnp.int32),
        interpret=interpret,
    )(pts_t, mask_i)

    sampled = jnp.take_along_axis(points, idx[..., None], axis=1)
    return sampled, idx


def fps_auto(
    points: Array,
    k: int,
    mask: Array | None = None,
    batch_tile: int | None = None,
):
    """Pallas FPS on TPU (padding the batch to a tile multiple), XLA loop
    fallback elsewhere."""
    import os

    from .fps import farthest_point_sampling

    platform = jax.devices()[0].platform
    if platform != "tpu":
        return farthest_point_sampling(points, k, mask=mask)
    B, N, _ = points.shape
    # Bigger batch tiles amortize the kernel's per-iteration loop overhead
    # (selection steps are sequential; per-step work scales with TB, and
    # grid programs serialize on the core, so fewer/fatter programs win
    # until the per-round VPU work leaves the latency shadow).
    # LSTPU_FPS_TILE overrides for on-chip sweeps (scripts/measure_encode.py).
    tile = batch_tile or int(os.environ.get("LSTPU_FPS_TILE", "0"))
    if not tile:
        tile = 32 if B >= 32 else (8 if B >= 8 else B)
    pad = (-B) % tile
    if pad:
        pts = jnp.concatenate(
            [points, jnp.zeros((pad, N, 3), points.dtype)], axis=0
        )
        m = (
            jnp.concatenate([mask, jnp.ones((pad, N), bool)], axis=0)
            if mask is not None
            else None
        )
    else:
        pts, m = points, mask
    sampled, idx = fps_pallas(pts, k, m, batch_tile=tile)
    return sampled[:B], idx[:B]
