"""Registration solver tests on a synthetic analytic SDF (sphere), avoiding
the heavy encoder: codes are hand-built so tests isolate the solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu import se3
from livingscenes_tpu.solver.code_optim import CodeOptimConfig, optimize_codes
from livingscenes_tpu.solver.registration import (
    RegistrationConfig,
    kabsch_from_codes,
    refine_se3,
)


def sphere_decode_factory(radius=0.5):
    """Analytic SDF of a sphere centered at codes['t'] with radius*s."""

    def decode(query, codes):
        d = jnp.linalg.norm(query - codes["t"], axis=-1)
        return d - radius * codes["s"][:, None]

    return decode


def make_codes(rng, b, c=16):
    return {
        "z_so3": jnp.asarray(rng.normal(size=(b, c, 3))),
        "z_inv": jnp.asarray(rng.normal(size=(b, c))),
        "s": jnp.ones((b,)),
        "t": jnp.zeros((b, 1, 3)),
    }


def test_kabsch_from_codes_recovers_relative_pose(rng):
    codes1 = make_codes(rng, 3)
    R = jnp.asarray(Rotation.random(3, random_state=0).as_matrix())
    t = jnp.asarray(rng.normal(size=(3, 1, 3)) * 0.5)
    codes2 = {
        **codes1,
        "z_so3": jnp.einsum("bij,bcj->bci", R, codes1["z_so3"]),
        "t": jnp.einsum("bij,bnj->bni", R, codes1["t"]) + t,
    }
    res = kabsch_from_codes(codes1, codes2)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.t[..., 0]), np.asarray(t[:, 0]), atol=1e-6
    )
    assert float(jnp.max(res.residual)) < 1e-6


def sample_sphere(rng, n, radius=0.5):
    v = rng.normal(size=(n, 3))
    return radius * v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_refine_se3_improves_noisy_init(rng):
    """Start from a perturbed init; SDF+OT refinement should pull the source
    sphere onto the target sphere."""
    decode = sphere_decode_factory()
    src = jnp.asarray(sample_sphere(rng, 128)[None])
    R_gt = jnp.eye(3)[None]
    t_gt = jnp.zeros((1, 3, 1))
    tgt = src  # target = sphere at origin (codes frame)
    codes = {
        "s": jnp.ones((1,)),
        "t": jnp.zeros((1, 1, 3)),
    }
    # Perturb the init by 6 degrees + 0.08m
    R0 = jnp.asarray(
        Rotation.from_euler("xyz", [4, -3, 3], degrees=True).as_matrix()[None]
    )
    t0 = jnp.asarray(np.array([[0.05, -0.04, 0.03]]).reshape(1, 3, 1))
    cfg = RegistrationConfig(n_steps=150, lr=0.01, lr_milestones=(100, 130))
    R, t, info = refine_se3(decode, src, tgt, codes, R0, t0, cfg)
    # translation must shrink toward 0 (a sphere is rotation-symmetric, so
    # only t is observable)
    assert float(jnp.linalg.norm(t)) < float(jnp.linalg.norm(t0)) * 0.5
    assert bool(jnp.all(jnp.isfinite(info["best_loss"])))


def test_refine_se3_early_stop_freezes(rng):
    """A huge LR forces rotation drift > threshold; the freeze must kick in
    and still return finite results."""
    decode = sphere_decode_factory()
    src = jnp.asarray(sample_sphere(rng, 64)[None])
    codes = {"s": jnp.ones((1,)), "t": jnp.zeros((1, 1, 3))}
    cfg = RegistrationConfig(n_steps=50, lr=5.0, early_stop_deg=10.0)
    # Perturbed init so the gradient is nonzero and the huge LR overshoots.
    R0 = jnp.asarray(
        Rotation.from_euler("z", 8, degrees=True).as_matrix()[None]
    )
    t0 = jnp.full((1, 3, 1), 0.05)
    R, t, info = refine_se3(decode, src, src, codes, R0, t0, cfg)
    assert bool(info["stopped"][0])
    assert bool(jnp.all(jnp.isfinite(R)))


def test_optimize_codes_recovers_center(rng):
    """Sphere points offset from the code's center: optimizing t must move
    it toward the true center (z_* stay near since SDF only depends on t)."""
    decode = sphere_decode_factory()
    true_center = np.array([0.06, -0.04, 0.05])
    pts = sample_sphere(rng, 256) + true_center
    pc = jnp.asarray(pts[None])
    codes = make_codes(rng, 1)
    cfg = CodeOptimConfig(n_steps=300, lr_t=2e-3, lr_milestone=250)
    best = optimize_codes(decode, codes, pc, cfg)
    err0 = np.linalg.norm(true_center)
    err1 = np.linalg.norm(np.asarray(best["t"][0, 0]) - true_center)
    assert err1 < 0.2 * err0
    # scale is never optimized
    np.testing.assert_array_equal(np.asarray(best["s"]), np.asarray(codes["s"]))


def test_optimize_codes_batched_best_tracking(rng):
    decode = sphere_decode_factory()
    pts = np.stack([sample_sphere(rng, 64), sample_sphere(rng, 64) + 0.1])
    codes = make_codes(rng, 2)
    best = optimize_codes(decode, codes, jnp.asarray(pts), CodeOptimConfig(n_steps=20))
    for k in ("z_inv", "z_so3", "t", "s"):
        assert best[k].shape == codes[k].shape


def test_refine_jits(rng):
    decode = sphere_decode_factory()
    src = jnp.asarray(sample_sphere(rng, 32)[None])
    codes = {"s": jnp.ones((1,)), "t": jnp.zeros((1, 1, 3))}
    cfg = RegistrationConfig(n_steps=5)
    fn = jax.jit(
        lambda s: refine_se3(
            decode, s, s, codes, jnp.eye(3)[None], jnp.zeros((1, 3, 1)), cfg
        )[0]
    )
    R = fn(src)
    assert R.shape == (1, 3, 3)


def test_solve_transform_from_latent(rng):
    """Closed-form relative SE(3) from two codes
    (pose_estimation.py:140-154)."""
    from livingscenes_tpu import se3

    R = jnp.asarray(Rotation.random(1, random_state=3).as_matrix())
    t = jnp.asarray(rng.normal(size=(1, 1, 3)))
    z1 = jnp.asarray(rng.normal(size=(1, 64, 3)))
    t1 = jnp.asarray(rng.normal(size=(1, 1, 3)))
    code1 = {"z_so3": z1, "t": t1}
    code2 = {
        "z_so3": jnp.einsum("bij,bcj->bci", R, z1),
        "t": jnp.einsum("bij,bnj->bni", R, t1) + t,
    }
    g = se3.solve_transform_from_latent(code1, code2)
    np.testing.assert_allclose(np.asarray(g[0, :3, :3]), np.asarray(R[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g[0, :3, 3]), np.asarray(t[0, 0]), atol=1e-8)


def _symch(a, b):
    d = np.linalg.norm(np.asarray(a)[:, :, None] - np.asarray(b)[:, None], axis=-1)
    return d.min(2).mean(1) + d.min(1).mean(1)


def test_icp_accept_symch_picks_per_instance_argmin(rng):
    """icp_accept='symch' must keep, per instance, whichever of the pre-ICP
    and post-ICP poses has lower symmetric chamfer (the production default;
    GT-tracking of the proxy measured in docs/probe_icp_accept_r4.json)."""
    from livingscenes_tpu.solver.registration import (
        solve_pairwise_registration,
    )

    B, N = 2, 48
    pc1 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32) * 0.4
    R_gt = jnp.asarray(Rotation.random(B, random_state=11).as_matrix(), jnp.float32)
    t_gt = jnp.asarray(rng.normal(size=(B, 1, 3)) * 0.3, jnp.float32)
    pc2 = jnp.einsum("bij,bnj->bni", R_gt, pc1) + t_gt

    # codes that make Kabsch exact for instance 1, ~8 deg off for instance 0
    codes1 = make_codes(rng, B)
    dR = jnp.asarray(
        np.stack(
            [
                Rotation.from_euler("xyz", [5, -4, 4], degrees=True).as_matrix(),
                np.eye(3),
            ]
        ),
        jnp.float32,
    )
    codes2 = {
        **codes1,
        "z_so3": jnp.einsum(
            "bij,bjk,bck->bci", R_gt, dR, codes1["z_so3"].astype(jnp.float32)
        ),
        "t": jnp.einsum("bij,bnj->bni", R_gt, codes1["t"].astype(jnp.float32))
        + t_gt,
    }

    base = dict(icp_iterations=25)
    R_pre, t_pre = solve_pairwise_registration(
        None, None, pc1, pc2, codes1, codes2, optim=False,
        cfg=RegistrationConfig(**base, use_icp=False),
    )
    R_icp, t_icp = solve_pairwise_registration(
        None, None, pc1, pc2, codes1, codes2, optim=False,
        cfg=RegistrationConfig(**base, icp_accept="always"),
    )
    R_sel, t_sel = solve_pairwise_registration(
        None, None, pc1, pc2, codes1, codes2, optim=False,
        cfg=RegistrationConfig(**base, icp_accept="symch"),
    )

    def moved(R, t):
        return jnp.einsum("bij,bnj->bni", R, pc1) + t[..., 0][:, None]

    p_pre = _symch(moved(R_pre, t_pre), pc2)
    p_icp = _symch(moved(R_icp, t_icp), pc2)
    for b in range(B):
        want_R, want_t = (
            (R_icp, t_icp) if p_icp[b] < p_pre[b] else (R_pre, t_pre)
        )
        if abs(p_icp[b] - p_pre[b]) < 1e-6:
            continue  # near-tie: either pose is acceptable
        np.testing.assert_allclose(
            np.asarray(R_sel[b]), np.asarray(want_R[b]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(t_sel[b]), np.asarray(want_t[b]), atol=1e-5
        )
    # ICP genuinely improves the perturbed instance, so acceptance takes it
    assert p_icp[0] < p_pre[0]
    # and the selection jits
    fn = jax.jit(
        lambda p1, p2: solve_pairwise_registration(
            None, None, p1, p2, codes1, codes2, optim=False,
            cfg=RegistrationConfig(**base, icp_accept="symch"),
        )
    )
    R_j, _ = fn(pc1, pc2)
    np.testing.assert_allclose(np.asarray(R_j), np.asarray(R_sel), atol=1e-5)


def test_refine_bf16_matches_f32(rng):
    """refine_bf16 (half-precision decoder inside the 400-step loop) must
    land on the same pose as the f32 path within registration noise."""
    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )
    from livingscenes_tpu.solver.registration import (
        solve_pairwise_registration,
    )

    model = ShapePrior(
        ShapePriorConfig(
            c_dim=32,
            num_layers=4,
            feat_dim=(16, 16, 32, 32),
            down_sample_layers=(2,),
            down_sample_factor=(2,),
            atten_start_layer=2,
            atten_multi_head_c=8,
            num_knn=8,
            scale_factor=10.0,
            decoder_dims=(96,) * 8,
            n_pcl=64,
        )
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.float32),
        model.init_params(jax.random.PRNGKey(0), n_points=64),
    )
    pc1 = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32) * 0.4
    R = jnp.asarray(
        Rotation.random(2, random_state=7).as_matrix(), jnp.float32
    )
    pc2 = jnp.einsum("bij,bnj->bni", R, pc1) + 0.1

    base = dict(n_steps=30, lr_milestones=(20,), use_icp=False)
    R32, t32 = solve_pairwise_registration(
        model, params, pc1, pc2, optim=True,
        cfg=RegistrationConfig(**base, refine_bf16=False),
    )
    R16, t16 = solve_pairwise_registration(
        model, params, pc1, pc2, optim=True,
        cfg=RegistrationConfig(**base, refine_bf16=True),
    )
    delta = np.asarray(se3.rotation_error(R32, R16))
    assert np.all(np.isfinite(np.asarray(R16)))
    assert np.all(delta < 2.0), f"bf16 refine drifted {delta} deg"
    assert float(jnp.abs(t32 - t16).max()) < 0.05
