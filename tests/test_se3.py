import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu import se3


def random_se3(rng, b):
    R = Rotation.random(b, random_state=rng.integers(1 << 30)).as_matrix()
    t = rng.normal(size=(b, 3))
    return jnp.asarray(np.concatenate([R, t[..., None]], axis=-1))


def test_inverse_concatenate_roundtrip(rng):
    g = random_se3(rng, 4)
    gi = se3.inverse(g)
    comp = se3.concatenate(g, gi)
    np.testing.assert_allclose(
        comp[..., :3, :3], np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-12
    )
    np.testing.assert_allclose(comp[..., :3, 3], 0.0, atol=1e-12)


def test_transform_matches_manual(rng):
    g = random_se3(rng, 2)
    pts = jnp.asarray(rng.normal(size=(2, 50, 3)))
    out = se3.transform(g, pts)
    R = np.asarray(g)[..., :3, :3]
    t = np.asarray(g)[..., :3, 3]
    expected = np.einsum("bij,bnj->bni", R, np.asarray(pts)) + t[:, None]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_rt_to_se3_shape(rng):
    g = random_se3(rng, 3)
    R, t = g[..., :3, :3], g[..., :3, 3:]
    mat = se3.rt_to_se3(R, t)
    assert mat.shape == (3, 4, 4)
    np.testing.assert_allclose(
        mat[:, 3], np.broadcast_to([0.0, 0.0, 0.0, 1.0], (3, 4))
    )


def test_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(8, 3)) * 0.8)
    R = se3.so3_exp(w)
    # orthonormality + det 1
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.eye(3)[None].repeat(8, 0), atol=1e-12
    )
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-12)
    w_back = se3.so3_log(R)
    np.testing.assert_allclose(w_back, w, atol=1e-9)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(5, 3))
    R = se3.so3_exp(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_se3_exp_zero_is_identity():
    g = se3.se3_exp(jnp.zeros((1, 6)))
    np.testing.assert_allclose(g[0], np.eye(3, 4), atol=1e-12)


def test_kabsch_recovers_transform(rng):
    g = random_se3(rng, 4)
    x1 = jnp.asarray(rng.normal(size=(4, 100, 3)))
    x2 = se3.transform(g, x1)
    R, t, res = se3.kabsch(x1, x2)
    # The eps guard in the weighted-mean denominator (matching the
    # reference, pose_estimation.py:68-69) biases t by ~|t| * 1e-7.
    np.testing.assert_allclose(R, g[..., :3, :3], atol=1e-12)
    np.testing.assert_allclose(t[..., 0], g[..., :3, 3], atol=1e-6)
    assert float(jnp.max(res)) < 1e-6


def test_kabsch_weighted_ignores_outliers(rng):
    g = random_se3(rng, 1)
    x1 = jnp.asarray(rng.normal(size=(1, 60, 3)))
    x2 = se3.transform(g, x1)
    # corrupt last 10 correspondences, zero their weights
    x2 = x2.at[:, -10:].add(5.0)
    w = jnp.ones((1, 60)).at[:, -10:].set(0.0)
    R, t, _ = se3.kabsch(x1, x2, weights=w)
    np.testing.assert_allclose(R, g[..., :3, :3], atol=1e-7)


def test_kabsch_reflection_guard(rng):
    # A degenerate correspondence that would give det = -1 without the fix.
    x1 = jnp.asarray(rng.normal(size=(1, 40, 3)))
    x2 = -x1  # pure reflection
    R, _, _ = se3.kabsch(x1, x2)
    assert float(jnp.linalg.det(R[0])) == pytest.approx(1.0, abs=1e-9)


def test_rotation_error_degrees(rng):
    ang = 27.0
    R1 = jnp.asarray(np.eye(3)[None])
    R2 = jnp.asarray(Rotation.from_euler("z", ang, degrees=True).as_matrix()[None])
    err = se3.rotation_error(R1, R2)
    np.testing.assert_allclose(err, [ang], atol=1e-9)


def test_transformation_error_zero_for_equal(rng):
    g = random_se3(rng, 1)
    pc1 = jnp.asarray(rng.normal(size=(1, 30, 3)))
    pc2 = jnp.asarray(rng.normal(size=(1, 30, 3)))
    err = se3.compute_transformation_error(pc1, pc2, g, g)
    assert float(err) < 1e-12


def test_solve_rotation_procrustes(rng):
    R_gt = Rotation.random(random_state=1).as_matrix()
    f1 = rng.normal(size=(1, 256, 3))
    f2 = np.einsum("ij,bnj->bni", R_gt, f1)
    R = se3.solve_rotation(jnp.asarray(f1), jnp.asarray(f2))
    np.testing.assert_allclose(R[0], R_gt, atol=1e-9)


def test_chamfer_under_transforms_zero(rng):
    g = random_se3(rng, 1)
    src = jnp.asarray(rng.normal(size=(1, 40, 3)))
    ref = se3.transform(g, src)
    cd = se3.chamfer_distance_under_transforms(src, ref, g, g)
    assert float(cd[0]) < 1e-10


def test_jit_and_grad():
    f = jax.jit(lambda x1, x2: jnp.sum(se3.kabsch(x1, x2)[2]))
    x1 = jnp.ones((1, 10, 3)) + jnp.arange(30).reshape(1, 10, 3) * 0.1
    x2 = x1[:, :, ::-1]
    g = jax.grad(f)(x1, x2)
    assert g.shape == x1.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_horn_rotation_matches_svd_kabsch():
    """Warm-started Horn quaternion solve == SVD branch on point-set
    covariances (the ICP use case: full-rank, healthy eigengap)."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(8, 200, 3))
    Rg = np.stack(
        [
            np.asarray(
                se3.matrix_from_quat_wxyz(
                    jnp.asarray(q / np.linalg.norm(q))
                )
            )
            for q in rng.normal(size=(8, 4))
        ]
    )
    b = np.einsum("bij,bnj->bni", Rg, a) + rng.normal(size=(8, 200, 3)) * 0.05
    a_c = a - a.mean(1, keepdims=True)
    b_c = b - b.mean(1, keepdims=True)
    cov = jnp.asarray(np.einsum("bni,bnj->bij", a_c, b_c))
    R_svd = se3.rotation_from_covariance(cov)
    # cold start, enough iterations
    R_h, q = se3.rotation_from_covariance_horn(cov, iters=60)
    assert float(jnp.max(se3.rotation_error(R_svd, R_h))) < 1e-3
    # warm start from the converged quaternion: few iterations suffice
    R_w, _ = se3.rotation_from_covariance_horn(cov, q0=q, iters=4)
    assert float(jnp.max(se3.rotation_error(R_svd, R_w))) < 1e-4


def test_quat_matrix_roundtrip():
    R = se3.random_rotation(jax.random.PRNGKey(5), (32,))
    q = se3.quat_wxyz_from_matrix(R)
    np.testing.assert_allclose(
        np.asarray(se3.matrix_from_quat_wxyz(q)), np.asarray(R), atol=1e-9
    )
