"""Latent code optimization against observed point clouds.

TPU re-design of More_Solver._optimize_code (lib_more/more_solver.py:191-228):
200 Adam steps minimizing MSE(SDF(pc), 0) over {z_inv, t, z_so3} with
per-leaf learning rates {1e-5, 1e-4, 5e-4}, LR x0.1 at step 160, keeping the
best-loss code. The reference runs one Python optimizer loop per instance;
here all instances optimize simultaneously in one `lax.scan` (per-instance
best tracking), which is also how multi-scan joint optimization batches.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import optax

Array = jax.Array
Codes = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class CodeOptimConfig:
    n_steps: int = 200
    lr_z_inv: float = 1e-5
    lr_t: float = 1e-4
    lr_z_so3: float = 5e-4
    lr_milestone: int = 160
    lr_decay: float = 0.1


def optimize_codes(
    decode_sdf,
    codes: Codes,
    pc: Array,
    cfg: CodeOptimConfig = CodeOptimConfig(),
) -> Codes:
    """Optimize codes so the SDF vanishes on the observed surface points.

    Args:
      decode_sdf: fn (query (B,M,3), codes) -> (B,M), field closed over
        params (evaluated in eval mode, like the reference's FieldWrapper).
      codes: batch of codes; `s` is kept fixed (the reference never
        optimizes scale).
      pc: (B, M, 3) observed surface points (FPS-downsampled).

    Returns the best-loss codes per instance.
    """
    B = pc.shape[0]
    # best_loss must carry the loss's dtype: when params/codes are wider
    # than the point cloud (e.g. f64 parity runs on f32 fixture data),
    # the per-item loss promotes past pc.dtype and the scan carry would
    # otherwise mismatch.
    dtype = jnp.result_type(pc.dtype, codes["z_inv"].dtype)

    opt_vars = {
        "z_inv": codes["z_inv"],
        "z_so3": codes["z_so3"],
        "t": codes["t"],
    }
    lrs = {
        "z_inv": cfg.lr_z_inv,
        "z_so3": cfg.lr_z_so3,
        "t": cfg.lr_t,
    }
    schedules = {
        k: optax.piecewise_constant_schedule(
            lr, {cfg.lr_milestone: cfg.lr_decay}
        )
        for k, lr in lrs.items()
    }
    opt = optax.multi_transform(
        {k: optax.adam(schedules[k]) for k in lrs},
        param_labels={k: k for k in lrs},
    )

    def loss_fn(ov):
        full = dict(codes, **ov)
        sdf = decode_sdf(pc, full)
        per_item = jnp.mean(sdf**2, axis=-1)  # (B,)
        return jnp.sum(per_item), per_item

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(carry, _):
        ov, opt_state, best_ov, best_loss = carry
        g, per_item = grad_fn(ov)
        updates, opt_state = opt.update(g, opt_state)
        ov_new = optax.apply_updates(ov, updates)
        improved = per_item < best_loss
        best_ov = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(improved, (B,) + (1,) * (new.ndim - 1)), new, old
            ),
            ov,
            best_ov,
        )
        best_loss = jnp.where(improved, per_item, best_loss)
        return (ov_new, opt_state, best_ov, best_loss), per_item

    init = (
        opt_vars,
        opt.init(opt_vars),
        opt_vars,
        jnp.full((B,), jnp.inf, dtype),
    )
    (ov, _, best_ov, best_loss), _ = jax.lax.scan(
        step, init, None, length=cfg.n_steps
    )
    return dict(codes, **best_ov)
