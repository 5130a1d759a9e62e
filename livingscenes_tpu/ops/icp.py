"""Fixed-iteration point-to-point ICP.

Replaces pytorch3d.ops.iterative_closest_point used as the final registration
refinement (lib_more/more_solver.py:182-188). A fixed number of
(nearest-neighbor -> Kabsch) rounds run inside `lax.scan`; convergence is
handled by freezing the update once relative RMSE change drops below the
threshold (masked update instead of dynamic early exit, so shapes stay
static under jit/vmap).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from .knn import pairwise_sqdist

Array = jax.Array


class ICPResult(NamedTuple):
    R: Array  # (B, 3, 3) — applied as x @ R^T + t  (matrix convention)
    t: Array  # (B, 3)
    rmse: Array  # (B,)
    converged: Array  # (B,) bool


def iterative_closest_point(
    src: Array,
    tgt: Array,
    init_R: Array | None = None,
    init_t: Array | None = None,
    max_iterations: int = 100,
    relative_rmse_thr: float = 1e-6,
    src_mask: Array | None = None,
    tgt_mask: Array | None = None,
    # Pallas 1-NN per iteration: measured SLOWER end-to-end (the per-
    # iteration kernel dispatch inside the scan outweighs the avoided
    # HBM distance matrix at these sizes) — off by default, kept for
    # larger-cloud use cases.
    use_pallas_nn: bool = False,
    # Fused correspondence step (ops/pallas_icp.py): one kernel per
    # iteration returns only the Kabsch sufficient statistics, so the
    # (B, N, M) distance matrix never touches HBM. None = auto (on for
    # TPU when both clouds are unmasked).
    fused_stats: bool | None = None,
    # Stop iterating once EVERY pair has hit the convergence freeze
    # (lax.while_loop bounded by max_iterations). Bit-identical results
    # to the fixed-length scan — frozen pairs never update. Measured
    # SLOWER on TPU at the production operating point (45.3 vs 41.0 ms,
    # B=64: the while_loop forfeits scan pipelining and a few straggler
    # pairs rarely all freeze), so the default stays the scan + the
    # per-pair kernel skip, which captures the win without the barrier.
    early_exit: bool = False,
) -> ICPResult:
    """Rigid ICP aligning src -> tgt.

    Args:
      src: (B, N, 3), tgt: (B, M, 3).
      init_R/init_t: optional initial rotation (B,3,3) / translation (B,3);
        the transform convention is y = x @ R_colmaj + t where `R_colmaj`
        follows pytorch3d's SimilarityTransform (i.e. our returned R is the
        standard row-vector form: y = R @ x + t with R = R_colmaj^T).
      src_mask/tgt_mask: optional validity masks for padded clouds.

    Returns ICPResult with the *standard* convention y = R x + t.
    """
    B, N, _ = src.shape
    dtype = src.dtype
    if init_R is None:
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    else:
        R0 = init_R.astype(dtype)
    if init_t is None:
        t0 = jnp.zeros((B, 3), dtype=dtype)
    else:
        t0 = init_t.astype(dtype)
    if fused_stats is None:
        fused_stats = (
            src_mask is None
            and tgt_mask is None
            and jax.devices()[0].platform == "tpu"
        )
    else:
        fused_stats = (
            fused_stats and src_mask is None and tgt_mask is None
        )
    if src_mask is None:
        src_mask = jnp.ones((B, N), dtype=bool)
    w = src_mask.astype(dtype)

    pallas_nn = (
        use_pallas_nn
        and tgt_mask is None
        and jax.devices()[0].platform == "tpu"
    )

    def nn_targets(x):
        if pallas_nn:
            # VMEM-resident 1-NN (ops/pallas_knn.py): skips materializing
            # the (B, N, M) distance matrix in HBM on every ICP iteration.
            from .pallas_knn import knn_pallas

            d1, idx1 = knn_pallas(x, tgt, 1)
            nn = jnp.take_along_axis(tgt, idx1, axis=1)
            return nn, d1[..., 0]
        d = pairwise_sqdist(x, tgt)
        if tgt_mask is not None:
            d = jnp.where(tgt_mask[:, None, :], d, 1e10)
        idx = jnp.argmin(d, axis=-1)
        nn = jnp.take_along_axis(tgt, idx[..., None], axis=1)
        dmin = jnp.min(d, axis=-1)
        return nn, dmin

    interp = jax.devices()[0].platform != "tpu"
    src_mean = jnp.mean(src, axis=1)  # (B, 3); constant across the scan
    # A VPU lane-reduction nn-accumulation variant (pass
    # pallas_icp.transpose_targets(tgt) as tgt_t below) was measured
    # SLOWER than the kernel's 4-lane MXU matmul at the production
    # operating point (30.9 vs 27.0 ms per freeze-disabled 100-iteration
    # solve, B=64 — scripts/measure_icp.py --no-freeze): the K=M matmul
    # pipelines behind the distance matmul better than four extra
    # (N, M) VPU passes. Kept for A/B; matmul is the shipped default.
    tgt_t = None

    def step(carry, _):
        R, t, prev_rmse, frozen, q = carry
        x = jnp.matmul(src, jnp.swapaxes(R, -1, -2)) + t[:, None, :]
        if fused_stats:
            from .pallas_icp import icp_iteration_stats

            # Frozen pairs skip the kernel body entirely (per-pair
            # @pl.when); their garbage stats are masked below exactly
            # as the freeze semantics already required.
            S, nn_sum, dmin_sum = icp_iteration_stats(
                x, src, tgt,
                active=jnp.logical_not(frozen),
                tgt_t=tgt_t,
                interpret=interp,
            )
            S = S.astype(dtype)
            rmse = jnp.sqrt(dmin_sum.astype(dtype) / N)
            nn_mean = nn_sum.astype(dtype) / N
            # Uniform-weight Kabsch from sufficient statistics:
            # cov = (1/N) sum src_c (nn_c)^T = mu_src mu_nn^T subtracted
            # from S/N. The rotation solve is Horn's quaternion method,
            # warm-started from the previous iteration's quaternion —
            # batched 3x3 SVD costs as much as the whole correspondence
            # kernel per step (docs/ROOFLINE.md ICP breakdown).
            cov = S / N - src_mean[:, :, None] * nn_mean[:, None, :]
            R_new, q_new = se3.rotation_from_covariance_horn(
                cov, q0=q, iters=8
            )
            q = jnp.where(frozen[:, None], q, q_new)
            t_new = nn_mean - jnp.matmul(
                R_new, src_mean[..., None]
            )[..., 0]
        else:
            nn, dmin = nn_targets(x)
            rmse = jnp.sqrt(
                jnp.sum(dmin * w, axis=-1)
                / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
            )
            # Re-fit against the original source so the accumulated
            # transform stays a single rigid motion.
            R_new, t_new, _ = se3.kabsch(src, nn, weights=w)
            t_new = t_new[..., 0]
        rel = jnp.abs(prev_rmse - rmse) / jnp.maximum(prev_rmse, 1e-12)
        frozen_new = frozen | (rel < relative_rmse_thr)
        keep = frozen[:, None, None]
        R_out = jnp.where(keep, R, R_new)
        t_out = jnp.where(frozen[:, None], t, t_new)
        rmse_out = jnp.where(frozen, prev_rmse, rmse)
        return (R_out, t_out, rmse_out, frozen_new, q), None

    q0 = se3.quat_wxyz_from_matrix(R0)
    init = (
        R0,
        t0,
        jnp.full((B,), jnp.inf, dtype),
        jnp.zeros((B,), bool),
        q0,
    )
    if early_exit:
        def cond(state):
            it, carry = state
            frozen = carry[3]
            return jnp.logical_and(
                it < max_iterations, jnp.logical_not(jnp.all(frozen))
            )

        def body(state):
            it, carry = state
            carry, _ = step(carry, None)
            return it + 1, carry

        _, (R, t, rmse, frozen, _) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init)
        )
    else:
        (R, t, rmse, frozen, _), _ = jax.lax.scan(
            step, init, None, length=max_iterations
        )
    return ICPResult(R=R, t=t, rmse=rmse, converged=frozen)
