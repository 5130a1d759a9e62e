"""Sinkhorn divergence fidelity (VERDICT round-1 weak #5).

geomloss is not installed, so the validation is vendor-free and stronger
than a value comparison: the debiased Sinkhorn divergence has analytic
ground truths that the reference's SamplesLoss('sinkhorn', p=2) is also
built to satisfy —

1. S(x, x) = 0 and S(x, y) > 0 for x != y.
2. blur -> 0: S converges to the exact Wasserstein cost (computed via
   scipy linear_sum_assignment on the same C = |x-y|^2/2).
3. For a pure translation, S(x + t, x) ~ |t|^2/2 and its gradient w.r.t.
   the translation is ~ t (the W2 geodesic direction).
4. Pose level (the operational criterion): refine_se3 driven by
   SDF+Sinkhorn recovers a synthetic ground-truth pose from a perturbed
   init — with the annealed schedule matching/beating 30 fixed iterations.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from livingscenes_tpu.ops.sinkhorn import (
    eps_annealing_schedule,
    sinkhorn_divergence,
)

jax64 = lambda a: jnp.asarray(a, jnp.float64)


def exact_w2_cost(x, y):
    """Exact OT cost with C = |x-y|^2/2, uniform weights (assignment)."""
    C = 0.5 * np.sum((x[:, None] - y[None]) ** 2, axis=-1)
    r, c = linear_sum_assignment(C)
    return C[r, c].mean()


def test_zero_on_identical_and_positive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 3))
    y = x + rng.normal(size=(64, 3)) * 0.3
    s_xx = float(sinkhorn_divergence(jax64(x), jax64(x), anneal=True))
    s_xy = float(sinkhorn_divergence(jax64(x), jax64(y), anneal=True))
    assert abs(s_xx) < 1e-8
    assert s_xy > 1e-3


def test_converges_to_exact_ot():
    """Debiasing at the production blur (0.05): the *converged* S matches
    exact W2 to < 0.5%, and the 9-update annealed schedule is strictly
    more faithful than the round-1 default of 30 fixed-temperature
    iterations (measured: 5.6% vs 11.4% under-convergence)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(48, 3))
    y = rng.normal(size=(48, 3)) * 0.8 + 0.2
    w2 = exact_w2_cost(x, y)

    s_conv = float(
        sinkhorn_divergence(jax64(x), jax64(y), blur=0.05, iters=2000)
    )
    assert abs(s_conv - w2) / w2 < 0.005, (s_conv, w2)

    s_anneal = float(
        sinkhorn_divergence(jax64(x), jax64(y), blur=0.05, anneal=True,
                            diameter=4.0)
    )
    s_fixed30 = float(
        sinkhorn_divergence(jax64(x), jax64(y), blur=0.05, iters=30)
    )
    err_anneal = abs(s_anneal - w2) / w2
    err_fixed = abs(s_fixed30 - w2) / w2
    assert err_anneal < 0.08, f"annealed divergence {s_anneal} vs W2 {w2}"
    assert err_anneal < err_fixed, (err_anneal, err_fixed)


def test_translation_quadratic_and_gradient():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 3)) * 0.3
    t = np.array([0.15, -0.1, 0.2])

    def loss(tv):
        return sinkhorn_divergence(
            jax64(x) + tv, jax64(x), blur=0.01, anneal=True
        )

    val = float(loss(jax64(t)))
    expected = 0.5 * np.sum(t**2)
    np.testing.assert_allclose(val, expected, rtol=0.05)
    g = np.asarray(jax.grad(lambda tv: loss(tv))(jax64(t)))
    np.testing.assert_allclose(g, t, rtol=0.1, atol=5e-3)


def test_refine_recovers_pose_with_annealing():
    """Operational check: SE(3) refinement driven by the Sinkhorn loss
    (decoder disabled by a zero-SDF stand-in) pulls a perturbed init onto
    the ground-truth pose (more_solver.py:138-178 behavior)."""
    from scipy.spatial.transform import Rotation

    from livingscenes_tpu import se3
    from livingscenes_tpu.solver.registration import (
        RegistrationConfig,
        refine_se3,
    )

    rng = np.random.default_rng(3)
    src = rng.normal(size=(2, 128, 3)).astype(np.float32) * 0.4
    R_gt = Rotation.random(2, random_state=4).as_matrix().astype(np.float32)
    t_gt = rng.normal(size=(2, 3, 1)).astype(np.float32) * 0.3
    tgt = np.einsum("bij,bnj->bni", R_gt, src) + t_gt.transpose(0, 2, 1)

    # init: 6-degree rotation and 5 cm translation off the truth
    dR = Rotation.from_rotvec(
        np.deg2rad(6.0) * np.array([[1, 0, 0], [0, 1, 0]])
    ).as_matrix().astype(np.float32)
    R0 = np.einsum("bij,bjk->bik", dR, R_gt)
    t0 = t_gt + 0.05

    decode_zero = lambda q, c: jnp.zeros(q.shape[:-1], q.dtype)
    cfg = RegistrationConfig(
        n_steps=150, lr=0.01, lr_milestones=(100, 130),
        sinkhorn_anneal=True, sinkhorn_blur=0.01, use_icp=False,
        early_stop_deg=45.0,
    )
    R, t, info = refine_se3(
        decode_zero,
        jnp.asarray(src),
        jnp.asarray(tgt),
        {"z_inv": jnp.zeros((2, 4))},
        jnp.asarray(R0),
        jnp.asarray(t0),
        cfg,
    )
    rre = np.asarray(se3.rotation_error(R, jnp.asarray(R_gt)))
    rte = np.linalg.norm(np.asarray(t) - t_gt, axis=(1, 2))
    rre0 = np.asarray(
        se3.rotation_error(jnp.asarray(R0), jnp.asarray(R_gt))
    )
    assert np.all(rre < rre0), (rre, rre0)  # improved from init
    assert np.all(rre < 2.0), f"RRE {rre} deg after refinement"
    assert np.all(rte < 0.03), f"RTE {rte} m after refinement"


def test_annealing_schedule_shape():
    sched = eps_annealing_schedule(blur=0.05, diameter=2.0, scaling=0.5)
    assert sched[0] == 4.0
    assert sched[-1] == 0.05**2
    assert all(a >= b for a, b in zip(sched, sched[1:]))
    assert len(sched) < 12  # ~6 anneal steps + tail, far below 30 iters


def test_pallas_iterates_match_xla_iterates():
    """The VMEM-resident Sinkhorn kernel (ops/pallas_sinkhorn.py,
    interpret mode) reproduces _sym_potentials' damped iterate state +
    final extrapolation to f32 rounding, so the TPU fast path computes
    the same divergence as the XLA path."""
    import jax
    import jax.numpy as jnp

    from livingscenes_tpu.ops.pallas_sinkhorn import sinkhorn_iterates
    from livingscenes_tpu.ops.sinkhorn import (
        _softmin_f,
        _softmin_g,
        _sq_cost,
        _sym_potentials,
        eps_annealing_schedule,
    )

    rng = np.random.default_rng(0)
    B, N, M = 2, 96, 128
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.4, jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, M, 3)) * 0.4, jnp.float32)
    schedule = tuple(eps_annealing_schedule(0.05, 2.0, 0.5))

    C = _sq_cost(x, y)
    f_ref, g_ref = _sym_potentials(C, list(schedule), 0, detach_iters=True)

    f_it, g_it = sinkhorn_iterates(x, y, schedule, interpret=True)
    log_a = jnp.full((B, N), -jnp.log(float(N)))
    log_b = jnp.full((B, M), -jnp.log(float(M)))
    eps = schedule[-1]
    f_pal = _softmin_f(C, log_b, g_it, eps)
    g_pal = _softmin_g(C, log_a, f_it, eps)

    np.testing.assert_allclose(
        np.asarray(f_pal), np.asarray(f_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_extrapolated_potentials_value_and_grad():
    """ot_extrapolated_potentials (iterates + extrapolation + closed-form
    VJP, all Pallas): values match the XLA implicit-grad path, and the
    gradient of mean(f)+mean(g) w.r.t. both clouds matches XLA autodiff
    of the detached-iterates path."""
    import jax
    import jax.numpy as jnp

    from livingscenes_tpu.ops.pallas_sinkhorn import (
        ot_extrapolated_potentials,
    )
    from livingscenes_tpu.ops.sinkhorn import (
        _sq_cost,
        _sym_potentials,
        eps_annealing_schedule,
    )

    rng = np.random.default_rng(5)
    B, N, M = 2, 96, 128
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.4, jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, M, 3)) * 0.4, jnp.float32)
    schedule = tuple(eps_annealing_schedule(0.05, 2.0, 0.5))

    def xla_loss(x, y):
        f, g = _sym_potentials(
            _sq_cost(x, y), list(schedule), 0, detach_iters=True
        )
        return jnp.sum(jnp.mean(f, axis=-1) + jnp.mean(g, axis=-1)), (f, g)

    def pal_loss(x, y):
        f, g = ot_extrapolated_potentials(x, y, schedule, interpret=True)
        return jnp.sum(jnp.mean(f, axis=-1) + jnp.mean(g, axis=-1)), (f, g)

    (v_ref, (f_ref, g_ref)), grads_ref = jax.value_and_grad(
        xla_loss, argnums=(0, 1), has_aux=True
    )(x, y)
    (v_pal, (f_pal, g_pal)), grads_pal = jax.value_and_grad(
        pal_loss, argnums=(0, 1), has_aux=True
    )(x, y)

    np.testing.assert_allclose(
        np.asarray(f_pal), np.asarray(f_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-6)
    for name, a, b in zip(("dx", "dy"), grads_ref, grads_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=name,
        )
