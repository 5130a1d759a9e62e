"""SDF/occupancy grid evaluation on TPU.

Replaces the reference's MISE octree loop (lib_shape_prior/.../libmise +
mesh_extractor2.py:109-125), which ping-pongs between a CPU octree and GPU
decoder chunks, with fully on-device evaluation:

* `dense_grid_values` — evaluate the whole (res+1)^3 corner grid in fixed
  chunks (a `lax.map`), batching every query through the decoder MLP (pure
  MXU work).
* `hierarchical_grid_values` — MISE-equivalent coarse-to-fine: dense at
  resolution0, then per upsampling step (x2) re-evaluate only grid points
  adjacent to active (sign-crossing) cells. Data-dependent point sets are
  handled with *static caps*: a `top_k` over the active-point mask selects
  up to K points, scattered back into a trilinearly-upsampled dense grid.
  Inactive regions keep interpolated values whose sign is already correct,
  so the extracted surface matches the fully-dense evaluation wherever the
  cap is not exceeded.

Both return the dense value grid at the final resolution; the host then runs
native isosurface extraction (recon/extractor.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_coordinates(resolution: int, box_size: float, dtype=jnp.float32):
    """(res+1)^3 corner points of the extraction cube, flattened (N, 3).

    Coordinate convention matches mesh_extractor2.py:115-118:
    p = box_size * (idx / res - 0.5).
    """
    n = resolution + 1
    idx = jnp.arange(n, dtype=dtype)
    x, y, z = jnp.meshgrid(idx, idx, idx, indexing="ij")
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return box_size * (pts / resolution - 0.5)


def _chunked_eval(
    decode: Callable[[Array], Array], pts: Array, chunk_size: int
) -> Array:
    """Evaluate decode over (N, 3) points in fixed-size chunks via lax.map."""
    n = pts.shape[0]
    n_chunks = -(-n // chunk_size)
    padded = n_chunks * chunk_size
    pts_p = jnp.pad(pts, ((0, padded - n), (0, 0)))
    chunks = pts_p.reshape(n_chunks, chunk_size, 3)
    vals = jax.lax.map(decode, chunks)
    return vals.reshape(padded)[:n]


def _eval_points(
    decode: Callable[[Array], Array],
    pts: Array,
    chunk_size: int,
    mesh=None,
    axis: str = "qp",
) -> Array:
    """Point evaluation, optionally query-sharded over a device mesh.

    With a mesh, each device evaluates its 1/n slice of the padded point
    set in local fixed-size chunks (shard_map; decode's captured
    codes/params are replicated, no collectives) — the multi-chip analog
    of the reference's `points_batch_size` host chunk loop
    (mesh_extractor2.py:141-156). Works both eagerly and inside jit.
    """
    if mesh is None or mesh.devices.size <= 1:
        return _chunked_eval(decode, pts, chunk_size)
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    n = pts.shape[0]
    padded = -(-n // n_dev) * n_dev
    pts_p = jnp.pad(pts, ((0, padded - n), (0, 0)))
    local = jax.shard_map(
        lambda p: _chunked_eval(decode, p, chunk_size),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    return local(pts_p)[:n]


def dense_grid_values(
    decode: Callable[[Array], Array],
    resolution: int,
    box_size: float = 1.1,
    chunk_size: int = 65536,
    dtype=jnp.float32,
    mesh=None,
    shard_axis: str = "qp",
) -> Array:
    """Dense (res+1)^3 value grid. `decode`: (M, 3) -> (M,) field values.

    With `mesh`, the query points are sharded over its `shard_axis`.
    """
    pts = grid_coordinates(resolution, box_size, dtype)
    vals = _eval_points(decode, pts, chunk_size, mesh, shard_axis)
    n = resolution + 1
    return vals.reshape(n, n, n)


def sharded_dense_grid_values(
    decode: Callable[[Array], Array],
    resolution: int,
    mesh,
    box_size: float = 1.1,
    axis: str = "qp",
    dtype=jnp.float32,
) -> Array:
    """Dense value grid with the query points sharded over a device mesh.

    The multi-chip analog of the reference's host-side chunk loop
    (mesh_extractor2.py:141-156, `points_batch_size`): the (res+1)^3
    corner points are padded to a device multiple and evaluated with the
    query axis sharded on `axis` — each chip decodes 1/n of the grid, no
    collectives (the decoder params close over `decode`, replicated).
    Returns the assembled (res+1)^3 grid (same values as
    dense_grid_values).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    pts = grid_coordinates(resolution, box_size, dtype)
    n_pts = pts.shape[0]
    padded = -(-n_pts // n_dev) * n_dev
    pts = jnp.pad(pts, ((0, padded - n_pts), (0, 0)))

    sharded_eval = jax.jit(
        decode,
        in_shardings=NamedSharding(mesh, P(axis)),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    vals = sharded_eval(pts)
    n = resolution + 1
    return vals[:n_pts].reshape(n, n, n)


def batched_hierarchical_grid_values(
    logits_fn: Callable[[Array, dict], Array],
    codes: dict,
    resolution0: int = 32,
    upsampling_steps: int = 2,
    threshold: float = 0.0,
    box_size: float = 1.1,
    chunk_size: int = 65536,
    refine_cap_factor: int = 20,
    dtype=jnp.float32,
    select_mode: str = "packsort",
    dedup: bool = True,
    final_merge: str = "device",
):
    """Coarse-to-fine value grids for a BATCH of instances in one program.

    `logits_fn(query (B, M, 3), codes) -> (B, M)` is the batched field
    (e.g. ShapePrior.occupancy_logits closed over params); `codes` is a
    codes pytree with leading batch axis B. Returns
    (values (B, n, n, n), overflow (B, steps)) — the vmapped equivalent of
    `hierarchical_grid_values` per instance, which is what the end-to-end
    pipeline's reconstruction stage runs for every matched instance of
    every scene pair at once (replacing the reference's per-instance MISE
    loop, mesh_extractor2.py:109-125).

    With `final_merge="host"` returns (values, overflow, final_idx
    (B, cap), final_vals (B, cap)); callers apply `apply_final_merge`
    per instance on the host (extract_scene_meshes does).
    """

    def one(codes_i):
        decode = lambda pts: logits_fn(pts[None], jax.tree.map(
            lambda x: x[None], codes_i))[0]
        values, stats = hierarchical_grid_values(
            decode,
            resolution0=resolution0,
            upsampling_steps=upsampling_steps,
            threshold=threshold,
            box_size=box_size,
            chunk_size=chunk_size,
            refine_cap_factor=refine_cap_factor,
            dtype=dtype,
            return_stats=True,
            select_mode=select_mode,
            dedup=dedup,
            final_merge=final_merge,
        )
        if final_merge == "host":
            return (values, stats["overflow"], stats["final_idx"],
                    stats["final_vals"])
        return values, stats["overflow"]

    return jax.vmap(one)(codes)


def _interleave_axis0(a: Array, b: Array) -> Array:
    """(n, ...), (n-1, ...) -> (2n-1, ...) = a0 b0 a1 b1 ... a_{n-1}.

    Expressed as stack+reshape (compiles to data movement the TPU VPU
    handles at line rate) instead of strided `.at[0::2].set` scatters.
    """
    head = jnp.stack([a[:-1], b], axis=1).reshape(
        (2 * (a.shape[0] - 1),) + a.shape[1:]
    )
    return jnp.concatenate([head, a[-1:]], axis=0)


def _double_resolution(v: Array) -> Array:
    """Trilinear x2 upsampling of a corner grid (n -> 2n-1 per axis),
    exact at existing corners."""

    def double_axis(a, axis):
        a = jnp.moveaxis(a, axis, 0)
        out = _interleave_axis0(a, 0.5 * (a[:-1] + a[1:]))
        return jnp.moveaxis(out, 0, axis)

    for ax in range(3):
        v = double_axis(v, ax)
    return v


def _active_cells(values: Array, threshold: float) -> Array:
    """(r, r, r) mask of cells whose corners straddle the threshold,
    dilated by one cell (mirrors MISE's activation of neighbors)."""
    occ = values > threshold
    # Cell straddles iff its 8 corners are not unanimous.
    all_in = occ
    any_in = occ
    for ax in range(3):
        lo = jax.lax.slice_in_dim(all_in, 0, all_in.shape[ax] - 1, axis=ax)
        hi = jax.lax.slice_in_dim(all_in, 1, all_in.shape[ax], axis=ax)
        all_in = lo & hi
        lo = jax.lax.slice_in_dim(any_in, 0, any_in.shape[ax] - 1, axis=ax)
        hi = jax.lax.slice_in_dim(any_in, 1, any_in.shape[ax], axis=ax)
        any_in = lo | hi
    active = any_in & ~all_in
    # Dilate by 1 cell in each direction (3^3 box = separable: 3 shifted
    # ORs per axis instead of 27 3-D ones).
    for ax in range(3):
        m = jnp.moveaxis(active, ax, 0)
        p = jnp.pad(m, ((1, 1),) + ((0, 0),) * (m.ndim - 1))
        m = p[:-2] | p[1:-1] | p[2:]
        active = jnp.moveaxis(m, 0, ax)
    return active


def _points_touching_active(active: Array) -> Array:
    """(2r+1)^3 mask of fine grid points lying in/on any active coarse cell.

    Fine point i touches coarse cells [ceil(i/2)-1, floor(i/2)] per axis
    (clamped): even i=2c touches cells {c-1, c}, odd i=2c+1 touches {c}.
    The touching set is a product of per-axis ranges, so the 3-D mask is
    built by expanding one axis at a time — a shifted OR for the even
    points interleaved with the cell mask for the odd points. Pure
    slice/stack data movement; no gathers (the previous 8-corner
    advanced-indexing form dominated the refine level's select cost on
    TPU).
    """

    def expand_axis(m, axis):
        m0 = jnp.moveaxis(m, axis, 0)
        p = jnp.pad(m0, ((1, 1),) + ((0, 0),) * (m0.ndim - 1))
        even = p[:-1] | p[1:]  # even[c] = cell[c-1] | cell[c]
        out = _interleave_axis0(even, m0)
        return jnp.moveaxis(out, 0, axis)

    for ax in range(3):
        active = expand_axis(active, ax)
    return active


def hierarchical_grid_values(
    decode: Callable[[Array], Array],
    resolution0: int = 32,
    upsampling_steps: int = 2,
    threshold: float = 0.0,
    box_size: float = 1.1,
    chunk_size: int = 65536,
    refine_cap_factor: int = 20,
    dtype=jnp.float32,
    return_stats: bool = False,
    mesh=None,
    shard_axis: str = "qp",
    select_mode: str = "packsort",
    dedup: bool = True,
    final_merge: str = "device",
):
    """Coarse-to-fine grid evaluation (MISE-equivalent, fixed shapes).

    Returns the (res_final+1)^3 value grid, res_final = res0 * 2^steps.
    `refine_cap_factor * (res+1)^2` bounds the refined points per level —
    the refine decode pays exactly cap queries/level whatever the
    content, so the factor is sized from measurement:
    scripts/measure_recon.py --counts over 64 trained-checkpoint shapes
    saw max 17.5 (median ~12.3), so the default 20 carries a 14% margin.
    Overflow is observable (see return_stats); raise the factor for
    content families wilder than closed object surfaces.

    `select_mode` picks how the ≤cap active fine points are compacted:

    * "packsort" (default): one int32 key sort — key = lattice index
      where active else n^3, `lax.sort`, keep the first `cap`. Selects
      the identical point SET as the closeness top_k whenever the cap
      does not bind (proven bit-equal, scripts/check_grid_variants.py),
      at roughly half the sort traffic (no f32 score tensor, no carried
      index payload). Under overflow, drops follow lattice order.
    * "topk": f32 closeness-to-threshold `top_k` — under overflow the
      points nearest the surface win, so accuracy degrades from the far
      field inward. Use when codes may be pathological/noisy and the
      cap is expected to bind (the `overflow` stat reports it either
      way).

    With `return_stats=True` also returns {"overflow": (steps,) int array}
    — the number of active fine points *dropped* past the cap per level
    (0 everywhere means the cap never bit; a pathological/noisy code is
    visible instead of silently producing a degraded mesh).

    `final_merge="host"` skips the LAST level's scatter back into the
    (res+1)^3 grid on device — the single largest non-decode op of the
    program (~63 ms of a 16-instance batch on a v5e chip) — and instead
    returns the trilinearly-upsampled grid plus stats["final_idx"] /
    stats["final_vals"]; the caller applies `flat[idx[idx < n^3]] =
    vals[idx < n^3]` on the host (a ~ms numpy fancy-index; the grid is
    pulled to the host for isosurface extraction anyway, see
    extract_scene_meshes). Requires return_stats=True.
    """
    if select_mode not in ("packsort", "topk"):
        raise ValueError(f"unknown select_mode {select_mode!r}")
    if final_merge not in ("device", "host"):
        raise ValueError(f"unknown final_merge {final_merge!r}")
    if final_merge == "host" and not return_stats:
        raise ValueError("final_merge='host' requires return_stats=True "
                         "(the merge payload travels in stats)")
    if final_merge == "host" and upsampling_steps == 0:
        # There is no final refine level whose scatter could be deferred;
        # silently returning a grid with no (final_idx, final_vals) would
        # KeyError downstream (ADVICE r4) — refuse up front.
        raise ValueError(
            "final_merge='host' requires upsampling_steps >= 1 "
            "(with 0 steps there is no refine scatter to defer; "
            "use final_merge='device')"
        )
    values = dense_grid_values(
        decode, resolution0, box_size, chunk_size, dtype, mesh, shard_axis
    )
    res = resolution0
    # Exact-value tracking (dedup=True): every level-0 corner is a true
    # decode; after each refinement the selected points become exact too.
    # A fine point whose value is already exact never needs re-evaluation
    # (decode is deterministic), so it is excluded from the refine budget
    # — for a typical surface that removes the ~1/8 of active fine points
    # that sit on the coarser lattice, lowering the cap_factor a shape
    # needs by ~2. Output is bit-identical while the cap doesn't bind
    # (the skipped evaluation would have rewritten the same number, up to
    # chunk-shape fusion noise ~1 ulp); under overflow it is strictly
    # better (every cap slot buys a NEW evaluation instead of re-deriving
    # a known value). dedup=False skips the tracking machinery (an extra
    # bool upsample + scatter per level) and simply re-decodes lattice
    # points — cheaper per level when the cap has headroom anyway.
    exact = jnp.ones_like(values, dtype=bool) if dedup else None
    overflow = []
    active_counts = []
    final_idx = final_vals = None
    for step in range(upsampling_steps):
        last = step == upsampling_steps - 1
        active = _active_cells(values, threshold)
        fine_mask = _points_touching_active(active)
        v_up = _double_resolution(values)
        if dedup:
            # exact mask on the doubled lattice: true at even-even-even
            # points only (interleave with False planes; no strided
            # scatter)
            e_up = exact
            for ax in range(3):
                m0 = jnp.moveaxis(e_up, ax, 0)
                m0 = _interleave_axis0(
                    m0, jnp.zeros((m0.shape[0] - 1,) + m0.shape[1:], bool)
                )
                e_up = jnp.moveaxis(m0, 0, ax)
        res = res * 2
        n = res + 1
        big = n * n * n
        cap = min(refine_cap_factor * n * n, big)

        if dedup:
            flat_mask = (fine_mask & ~e_up).reshape(-1)
        else:
            flat_mask = fine_mask.reshape(-1)
        n_active = jnp.sum(flat_mask.astype(jnp.int32))
        active_counts.append(n_active)
        overflow.append(jnp.maximum(n_active - cap, 0))
        if select_mode == "packsort":
            iota = jnp.arange(big, dtype=jnp.int32)
            key = jnp.where(flat_mask, iota, jnp.int32(big))
            top_idx = jax.lax.sort(key)[:cap]
            selected = top_idx < big
            idx_c = jnp.minimum(top_idx, big - 1)
        else:
            closeness = -jnp.abs(v_up.reshape(-1) - threshold)
            score = jnp.where(flat_mask, closeness, -jnp.inf)
            top_score, top_idx = jax.lax.top_k(score, cap)
            selected = jnp.isfinite(top_score)
            idx_c = top_idx
        # Coordinates of the selected fine points.
        ii = idx_c // (n * n)
        jj = (idx_c // n) % n
        kk = idx_c % n
        pts = (
            jnp.stack([ii, jj, kk], axis=-1).astype(dtype) / res - 0.5
        ) * box_size
        vals = _eval_points(decode, pts, chunk_size, mesh, shard_axis)
        # Scatter the refined values back. Selected indices are unique by
        # construction; slots past n_active are routed to unique
        # out-of-bounds sentinels and dropped, so the scatter carries
        # both XLA fast-path promises (unique_indices + promise-free
        # drop mode) instead of the general duplicate-safe lowering — on
        # a v5e chip the general scatter pair cost ~190 ms of the
        # production grid eval (scripts/probe_recon_penalty.py); this
        # form also removes the flat[top_idx] fallback gather.
        idx_sel = jnp.where(
            selected, idx_c, big + jnp.arange(cap, dtype=idx_c.dtype)
        )
        if final_merge == "host" and last:
            values = v_up
            final_idx, final_vals = idx_sel, vals
            break
        values = (
            v_up.reshape(-1)
            .at[idx_sel]
            .set(vals, mode="drop", unique_indices=True)
            .reshape(n, n, n)
        )
        if dedup:
            exact = (
                e_up.reshape(-1)
                .at[idx_sel]
                .set(True, mode="drop", unique_indices=True)
                .reshape(n, n, n)
            )
    if return_stats:
        stats = {
            "overflow": (
                jnp.stack(overflow)
                if overflow
                else jnp.zeros((0,), jnp.int32)
            ),
            # Pre-cap active-point count per level (what MISE would have
            # evaluated). cap_factor tuning data: the refine decode costs
            # cap = cap_factor * (res+1)^2 per level regardless of
            # content, so cap_factor should sit just above the real
            # shapes' n_active / (res+1)^2 (scripts/measure_recon.py
            # --counts measures it on trained-checkpoint shapes).
            "n_active": (
                jnp.stack(active_counts)
                if active_counts
                else jnp.zeros((0,), jnp.int32)
            ),
        }
        if final_idx is not None:
            stats["final_idx"] = final_idx
            stats["final_vals"] = final_vals
        return values, stats
    return values


def apply_final_merge(grid, final_idx, final_vals):
    """Host side of final_merge='host': scatter the last level's refined
    values into the (n,n,n) numpy grid. Unselected slots carry indices
    >= n^3 and are dropped — the exact semantics of the device scatter's
    drop mode."""
    import numpy as np

    flat = np.asarray(grid).reshape(-1).copy()
    idx = np.asarray(final_idx)
    vals = np.asarray(final_vals)
    m = idx < flat.size
    flat[idx[m]] = vals[m]
    return flat.reshape(grid.shape)
