"""Fused ICP correspondence-step kernel (ops/pallas_icp.py) vs the XLA
path, and the stats-based ICP solve end-to-end (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from livingscenes_tpu.ops.icp import iterative_closest_point
from livingscenes_tpu.ops.pallas_icp import icp_iteration_stats
from livingscenes_tpu.ops.knn import pairwise_sqdist


def test_stats_match_xla():
    rng = np.random.default_rng(0)
    B, N, M = 3, 128, 160
    x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)

    S, nn_sum, dmin_sum = icp_iteration_stats(x, src, tgt, interpret=True)

    d = pairwise_sqdist(x, tgt)
    idx = jnp.argmin(d, axis=-1)
    nn = jnp.take_along_axis(tgt, idx[..., None], axis=1)
    S_ref = jnp.matmul(jnp.swapaxes(src, -1, -2), nn)
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(S_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(nn_sum), np.asarray(jnp.sum(nn, axis=1)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dmin_sum),
        np.asarray(jnp.sum(jnp.maximum(jnp.min(d, -1), 0.0), -1)),
        rtol=1e-4,
    )


def test_vpu_acc_matches_matmul_acc():
    """The VPU lane-reduction nn accumulation (tgt_t path) returns the
    same statistics as the matmul path."""
    from livingscenes_tpu.ops.pallas_icp import transpose_targets

    rng = np.random.default_rng(7)
    B, N, M = 3, 128, 160
    x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)

    mm = icp_iteration_stats(x, src, tgt, interpret=True)
    vpu = icp_iteration_stats(
        x, src, tgt, tgt_t=transpose_targets(tgt), interpret=True
    )
    for u, v in zip(mm, vpu):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-5, atol=1e-5
        )


def test_fused_icp_recovers_pose_and_matches_xla():
    rng = np.random.default_rng(1)
    B, N = 2, 256
    src = rng.normal(size=(B, N, 3)).astype(np.float32)
    R_gt = Rotation.random(B, random_state=2).as_matrix().astype(np.float32)
    # Small perturbation: ICP is a local refiner.
    R_gt = np.stack(
        [
            Rotation.from_rotvec(0.15 * v).as_matrix()
            for v in rng.normal(size=(B, 3))
        ]
    ).astype(np.float32)
    t_gt = (rng.normal(size=(B, 3)) * 0.1).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R_gt, src) + t_gt[:, None]

    res_f = iterative_closest_point(
        jnp.asarray(src), jnp.asarray(tgt),
        max_iterations=30, fused_stats=True,
    )
    res_x = iterative_closest_point(
        jnp.asarray(src), jnp.asarray(tgt),
        max_iterations=30, fused_stats=False,
    )
    from livingscenes_tpu import se3

    rre_f = np.asarray(se3.rotation_error(res_f.R, jnp.asarray(R_gt)))
    assert rre_f.max() < 0.1, rre_f
    np.testing.assert_allclose(
        np.asarray(res_f.t), np.asarray(t_gt), atol=5e-3
    )
    # Fused and XLA paths agree on the solution.
    np.testing.assert_allclose(
        np.asarray(res_f.R), np.asarray(res_x.R), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_f.t), np.asarray(res_x.t), atol=1e-3
    )


def test_fused_flag_ignored_with_masks():
    """fused_stats is silently disabled when masks are present."""
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    tgt = src + 0.01
    mask = jnp.ones((1, 64), bool)
    res = iterative_closest_point(
        src, tgt, max_iterations=5, src_mask=mask, fused_stats=True
    )
    assert np.isfinite(np.asarray(res.R)).all()


def test_early_exit_matches_scan():
    """while_loop early exit is bit-equivalent to the fixed scan."""
    rng = np.random.default_rng(5)
    B, N = 4, 192
    src = rng.normal(size=(B, N, 3)).astype(np.float32)
    R = np.stack(
        [
            Rotation.from_rotvec(0.05 * v).as_matrix()
            for v in rng.normal(size=(B, 3))
        ]
    ).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R, src) + 0.01

    res_scan = iterative_closest_point(
        jnp.asarray(src), jnp.asarray(tgt),
        max_iterations=50, fused_stats=True, early_exit=False,
    )
    res_wl = iterative_closest_point(
        jnp.asarray(src), jnp.asarray(tgt),
        max_iterations=50, fused_stats=True, early_exit=True,
    )
    np.testing.assert_allclose(
        np.asarray(res_scan.R), np.asarray(res_wl.R), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_scan.t), np.asarray(res_wl.t), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res_scan.converged), np.asarray(res_wl.converged)
    )


def test_active_skip_and_exact_flag():
    """Inactive pairs are skipped (garbage out) while active pairs'
    stats are unaffected; exact=True matches too (f32 inputs on CPU
    interpret are exact either way)."""
    rng = np.random.default_rng(6)
    B, N, M = 4, 96, 128
    x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)

    full = icp_iteration_stats(x, src, tgt, interpret=True)
    active = jnp.asarray([1, 0, 1, 0], jnp.int32)
    part = icp_iteration_stats(x, src, tgt, active=active, interpret=True)
    for u, v in zip(full, part):
        np.testing.assert_allclose(
            np.asarray(u)[::2], np.asarray(v)[::2], rtol=1e-6
        )
    exact = icp_iteration_stats(x, src, tgt, interpret=True, exact=True)
    for u, v in zip(full, exact):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-5, atol=1e-5
        )
