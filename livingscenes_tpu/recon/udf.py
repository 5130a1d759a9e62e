"""UDF dense-surface point extraction by gradient walking.

Re-design of the reference's ndf_utils/pcl_extractor.py:35-132 (used when
the prior is trained with unsigned distance fields): sample candidate
points in the extraction box, walk them along -grad|f| * |f| for a fixed
number of steps, accept points whose |f| falls below the threshold and
resample rejected ones near accepted survivors. All loops are fixed-trip
`lax.fori_loop`s, so the extractor jits and vmaps across instances.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UDFExtractorConfig:
    num_points: int = 20000
    num_steps: int = 8
    num_rounds: int = 3
    threshold: float = 0.01
    box_size: float = 1.1
    sigma_resample: float = 0.02


def extract_surface_points(
    udf: Callable[[Array], Array],
    cfg: UDFExtractorConfig = UDFExtractorConfig(),
    rng: Array | None = None,
):
    """Extract dense surface samples of |field| = 0.

    Args:
      udf: (M, 3) -> (M,) unsigned distance values (differentiable).
      rng: PRNG key.

    Returns (points (num_points, 3), accepted_mask (num_points,)). Points
    whose mask is False never converged below threshold.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    grad_fn = jax.vmap(jax.grad(lambda p: udf(p[None])[0]))

    def walk(pts):
        def step(_, p):
            d = udf(p)
            g = grad_fn(p)
            g = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9
            )
            return p - g * d[:, None]

        return jax.lax.fori_loop(0, cfg.num_steps, step, pts)

    k0, rng = jax.random.split(rng)
    pts = (
        jax.random.uniform(k0, (cfg.num_points, 3)) - 0.5
    ) * cfg.box_size

    def round_body(i, carry):
        pts, rng = carry
        pts = walk(pts)
        d = udf(pts)
        ok = d < cfg.threshold
        # resample rejected points near random accepted ones
        rng, k1, k2 = jax.random.split(rng, 3)
        weights = ok.astype(jnp.float32)
        weights = weights / jnp.maximum(weights.sum(), 1.0)
        src = jax.random.choice(
            k1, cfg.num_points, (cfg.num_points,), p=weights
        )
        jitter = (
            jax.random.normal(k2, (cfg.num_points, 3)) * cfg.sigma_resample
        )
        resampled = pts[src] + jitter
        pts = jnp.where(ok[:, None], pts, resampled)
        return pts, rng

    pts, rng = jax.lax.fori_loop(0, cfg.num_rounds, round_body, (pts, rng))
    pts = walk(pts)
    mask = udf(pts) < cfg.threshold
    # clamp to the extraction box
    half = cfg.box_size / 2
    pts = jnp.clip(pts, -half, half)
    return pts, mask
