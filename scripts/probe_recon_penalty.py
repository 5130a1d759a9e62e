"""Localize the recon full-program 'composition penalty' on TPU.

Round-4 measurements (ROUND4_NOTES §3) show the full hierarchical grid
eval runs at 11.5 Mq/s while the *same total decode work* isolated runs
at 20.4 Mq/s and the decode-free select machinery costs only ~27 ms —
i.e. ~295 ms/call of the full program is unaccounted interaction between
the decode and the grid machinery. This script re-times a local fork of
`recon.grid.hierarchical_grid_values` (control, validated against the
production `full` number) with one structural element removed at a time:

  control      exact production semantics (should reproduce ~744 ms)
  free0        level-0 dense decode replaced by a coords-sum (refine
               decode still real) — charges level-0's share
  freerefine   refine decodes replaced by a coords-sum (level-0 real)
               — charges the refine levels' share
  fixedpts     refine decode runs on cap-many FIXED points (independent
               of top_k) while scatter still uses top_idx — removes the
               top_k -> gather -> decode data dependency / gathered
               point layout
  noscatter    refine decode on the real selected points, but results
               merged with a flat add instead of the .at[top_idx].set
               scatter — removes the 2.1M-point scatter after decode
  nodedup      exact-value dedup tracking removed (mask = fine_mask
               alone) — charges the e_up bookkeeping
  notopk       top_k replaced by an iota selection (same shapes; no
               sort) — charges the 2.1M-element top_k sort
  oldscatter   the pre-round-4 duplicate-safe scatter + fallback gather
               (control is the current unique/drop production form)
  packsort     top_k(f32 score) replaced by an int32 packed-key sort:
               key = where(mask, iota, N), jnp.sort, take [:cap] — the
               minimal exact compaction (half the sort traffic, no f32
               score construction; drop order under overflow becomes
               lattice order instead of closeness)
  ps_nodedup   packsort + exact-value dedup tracking removed
  ps_nd_hostfinal  packsort + nodedup + the FINAL level's merge moved
               off-device: the program returns (v_up, idx, vals) and the
               host applies flat[idx]=vals before marching tets (a ~ms
               numpy fancy-index; removes the 399k-update scatter into
               the 2.15M grid from the device program)

Each variant is timed exactly like scripts/measure_recon.py: `reps`
calls inside ONE jitted lax.scan, second invocation timed (tunnel floors
per-dispatch latency; see measure_encode.py).

Usage: python scripts/probe_recon_penalty.py --variant control
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from livingscenes_tpu.recon.grid import (
    _active_cells,
    _chunked_eval,
    _double_resolution,
    _interleave_axis0,
    _points_touching_active,
    dense_grid_values,
)
from scripts.measure_recon import make_model_codes, total_queries


def hier_variant(
    decode,
    variant: str,
    resolution0: int,
    upsampling_steps: int,
    threshold: float,
    box_size: float,
    chunk_size: int,
    refine_cap_factor: int,
):
    """Fork of hierarchical_grid_values with one element removed."""
    free = lambda pts: jnp.sum(pts, axis=-1)
    dec0 = free if variant == "free0" else decode
    dec_ref = free if variant == "freerefine" else decode
    packsort = variant.startswith("packsort") or variant.startswith("ps_")
    nodedup = variant == "nodedup" or "_nodedup" in variant or "_nd" in variant
    hostfinal = "hostfinal" in variant
    extra = jnp.float32(0)  # data dependence for host-merge outputs

    values = dense_grid_values(
        decode=dec0,
        resolution=resolution0,
        box_size=box_size,
        chunk_size=chunk_size,
    )
    res = resolution0
    exact = jnp.ones_like(values, dtype=bool)
    for step in range(upsampling_steps):
        last = step == upsampling_steps - 1
        active = _active_cells(values, threshold)
        fine_mask = _points_touching_active(active)
        v_up = _double_resolution(values)
        if nodedup:
            e_up = None
        else:
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

        if nodedup:
            flat_mask = fine_mask.reshape(-1)
        else:
            flat_mask = (fine_mask & ~e_up).reshape(-1)
        if packsort:
            iota = jnp.arange(big, dtype=jnp.int32)
            key = jnp.where(flat_mask, iota, jnp.int32(big))
            top_idx = jax.lax.sort(key)[:cap]
            selected = top_idx < big
            idx_c = jnp.minimum(top_idx, big - 1)
        else:
            closeness = -jnp.abs(v_up.reshape(-1) - threshold)
            score = jnp.where(flat_mask, closeness, -jnp.inf)
            if variant == "notopk":
                # same output shapes/dtypes, no sort; data dependence on
                # the score kept via one scalar so nothing constant-folds
                top_idx = jnp.arange(cap, dtype=jnp.int32) + (
                    jnp.max(score[:1]).astype(jnp.int32) * 0
                )
                top_score = score[:cap]
            else:
                top_score, top_idx = jax.lax.top_k(score, cap)
            selected = jnp.isfinite(top_score)
            idx_c = top_idx
        ii = idx_c // (n * n)
        jj = (idx_c // n) % n
        kk = idx_c % n
        pts = (
            jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) / res - 0.5
        ) * box_size
        if variant == "fixedpts":
            # same shape/count, no dependence on top_idx
            lin = jnp.arange(cap, dtype=jnp.float32)
            pts = jnp.stack(
                [lin % n, (lin / n) % n, lin / (n * n)], axis=-1
            ) / res - 0.5
        vals = _chunked_eval(dec_ref, pts, chunk_size)
        idx_sel = jnp.where(
            selected, idx_c, big + jnp.arange(cap, dtype=idx_c.dtype)
        )
        if variant == "noscatter":
            values = v_up + 1e-20 * jnp.sum(vals)
            exact = e_up
        elif variant == "oldscatter":
            flat = v_up.reshape(-1)
            new_flat = flat.at[top_idx].set(
                jnp.where(selected, vals, flat[top_idx])
            )
            values = new_flat.reshape(n, n, n)
            exact = (
                e_up.reshape(-1)
                .at[top_idx]
                .set(selected | e_up.reshape(-1)[top_idx])
                .reshape(n, n, n)
            )
        elif hostfinal and last:
            # final merge happens on the host: the device emits the
            # upsampled grid + (idx, vals); keep a data dependence so
            # neither is DCE'd
            values = v_up
            extra = extra + 1e-20 * (
                jnp.sum(vals) + jnp.sum(idx_sel.astype(jnp.float32))
            )
        else:
            values = (
                v_up.reshape(-1)
                .at[idx_sel]
                .set(vals, mode="drop", unique_indices=True)
                .reshape(n, n, n)
            )
            if not nodedup:
                exact = (
                    e_up.reshape(-1)
                    .at[idx_sel]
                    .set(True, mode="drop", unique_indices=True)
                    .reshape(n, n, n)
                )
    return values + extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res0", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cap", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variant",
        default="control",
        choices=[
            "control",
            "free0",
            "freerefine",
            "fixedpts",
            "noscatter",
            "nodedup",
            "notopk",
            "oldscatter",
            "packsort",
            "ps_nodedup",
            "ps_nd_hostfinal",
        ],
    )
    args = ap.parse_args()

    model, params, codes, logits_fn = make_model_codes(args.batch, False)
    B = args.batch
    n_q = total_queries(args.res0, args.steps, args.cap)

    def one(codes_i):
        decode = lambda pts: logits_fn(
            pts[None], jax.tree.map(lambda x: x[None], codes_i)
        )[0]
        return hier_variant(
            decode,
            args.variant,
            resolution0=args.res0,
            upsampling_steps=args.steps,
            threshold=0.0,
            box_size=1.1,
            chunk_size=args.chunk,
            refine_cap_factor=args.cap,
        )

    def body(c, _):
        perturbed = dict(codes, z_inv=codes["z_inv"] + c * 1e-9)
        values = jax.vmap(one)(perturbed)
        return c + jnp.sum(values[:, ::64, ::64, ::64]), None

    run = jax.jit(
        lambda: jax.lax.scan(body, jnp.float32(0), None, args.reps)[0]
    )
    t0 = time.perf_counter()
    float(run())
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / args.reps
    print(
        f"recon-penalty [{args.variant}] B={B} res0={args.res0} "
        f"steps={args.steps} cap={args.cap} ({n_q} q/inst): "
        f"{dt * 1e3:.1f} ms/call ({B * n_q / dt / 1e6:.1f} Mq/s)"
    )


if __name__ == "__main__":
    main()
