"""End-to-end scene-pair test: build a synthetic 2-scan scene (3 objects,
rigidly moved), run the full MoreSolver pipeline — encode, match, register,
transport, mesh — and check matching + registration correctness.

This is the framework's equivalent of the reference's FlyingShape smoke flow
(eval_flyingshape.py:62-173) with an untrained (but equivariant) prior —
matching and registration correctness follow from equivariance alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu import se3
from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
from livingscenes_tpu.solver import MoreSolver, MoreSolverConfig
from livingscenes_tpu.solver.registration import RegistrationConfig
from livingscenes_tpu.recon.extractor import MeshExtractorConfig

SMALL = ShapePriorConfig(
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
    n_pcl=128,
)

N_OBJ, N_PTS = 3, 128


def make_objects(rng):
    """Three distinct object clouds (box, cross, L-shape)."""
    box = rng.uniform(-0.5, 0.5, size=(N_PTS, 3)) * [1.0, 0.6, 0.3]
    arm1 = rng.uniform(-0.5, 0.5, size=(N_PTS // 2, 3)) * [1.0, 0.15, 0.15]
    arm2 = rng.uniform(-0.5, 0.5, size=(N_PTS - N_PTS // 2, 3)) * [0.15, 1.0, 0.15]
    cross = np.concatenate([arm1, arm2])
    l1 = rng.uniform(0, 1, size=(N_PTS // 2, 3)) * [0.8, 0.2, 0.2]
    l2 = rng.uniform(0, 1, size=(N_PTS - N_PTS // 2, 3)) * [0.2, 0.2, 0.8]
    ell = np.concatenate([l1, l2]) - 0.4
    return np.stack([box, cross, ell])


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(12)
    objs = make_objects(rng)
    # place in the reference scan
    offsets = np.array([[0, 0, 0], [2.0, 0, 0], [0, 2.0, 0]])
    ref = objs + offsets[:, None, :]
    # rescan: per-object rigid motions, order permuted
    Rm = Rotation.random(N_OBJ, random_state=4).as_matrix()
    tm = rng.normal(size=(N_OBJ, 3)) * 0.5 + np.array([0, 0, 1.0])
    rescan = np.einsum("bij,bnj->bni", Rm, ref) + tm[:, None, :]
    perm = np.array([2, 0, 1])
    return (
        jnp.asarray(ref, jnp.float64),
        jnp.asarray(rescan[perm], jnp.float64),
        Rm,
        tm,
        perm,
    )


@pytest.fixture(scope="module")
def solver():
    model = ShapePrior(SMALL)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float64),
        model.init_params(jax.random.PRNGKey(0)),
    )
    cfg = MoreSolverConfig(
        n_input_point=128,
        registration=RegistrationConfig(use_icp=True, icp_iterations=10),
        mesh_extractor=MeshExtractorConfig(
            resolution0=8, upsampling_steps=1, simplify_nfaces=None
        ),
    )
    return MoreSolver(model, params, cfg)


def test_end2end_matching_and_registration(scene, solver):
    ref, rescan, Rm, tm, perm = scene
    out = solver.solve_end2end(
        ref, None, rescan, None, optim=False, extract_meshes=False
    )
    # matching must recover the permutation: ref i <-> rescan position of i
    inv_pos = {int(o): i for i, o in enumerate(perm)}
    m0 = np.asarray(out["matches0"])
    for i in range(N_OBJ):
        assert m0[i] == inv_pos[i], (m0, perm)

    # registration of each matched pair must recover the per-object motion
    tsfm = np.asarray(out["registration"])
    for i in range(N_OBJ):
        R_pred = tsfm[i, :3, :3]
        t_pred = tsfm[i, :3, 3]
        rre = float(
            se3.rotation_error(
                jnp.asarray(R_pred)[None], jnp.asarray(Rm[i])[None]
            )[0]
        )
        rte = float(np.linalg.norm(t_pred - tm[i]))
        assert rre < 1.0, f"obj {i}: RRE {rre}"
        assert rte < 0.05, f"obj {i}: RTE {rte}"


def test_end2end_code_transport_consistency(scene, solver):
    """Transported rescan codes must land on the ref instance's codes."""
    ref, rescan, *_ = scene
    out = solver.solve_end2end(
        ref, None, rescan, None, optim=False, extract_meshes=False
    )
    ref_codes = out["ref_codes"]
    transported = out["transported_codes"]
    # invariant part unchanged by transport; equals the matched ref z_inv up
    # to encoder noise on different point samples of the same surface
    # (identical points here, so tight)
    np.testing.assert_allclose(
        np.asarray(transported["t"]),
        np.asarray(ref_codes["t"]),
        atol=0.05,
    )


def test_end2end_mesh_extraction_runs(scene, solver):
    ref, rescan, *_ = scene
    out = solver.solve_end2end(
        ref[:1], None, rescan[:1], None, optim=False, extract_meshes=True
    )
    assert len(out["mesh_list"]) == 1


def test_registration_with_refinement_runs(scene, solver):
    """The optim branch (SE(3) manifold refinement) compiles and returns
    finite results on a small step budget."""
    ref, rescan, Rm, tm, perm = scene
    cfg_small = RegistrationConfig(
        n_steps=10, sinkhorn_iters=5, use_icp=False
    )
    from livingscenes_tpu.solver.registration import solve_pairwise_registration

    R, t = solve_pairwise_registration(
        solver.model,
        solver.params,
        ref[:1],
        rescan[perm.tolist().index(0)][None],
        optim=True,
        cfg=cfg_small,
    )
    assert bool(jnp.all(jnp.isfinite(R))) and bool(jnp.all(jnp.isfinite(t)))


def test_registration_n_init_restarts(scene):
    """n_init > 1 (configs/more_3rscan.yaml:10): multiple random-start FPS
    restarts, best Kabsch residual wins; registration stays correct on
    oversized input clouds."""
    ref, rescan, Rm, tm, perm = scene
    model = ShapePrior(SMALL)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float64),
        model.init_params(jax.random.PRNGKey(0)),
    )
    cfg = MoreSolverConfig(
        n_input_point=64,  # < N_PTS so the FPS-restart path triggers
        n_init=3,
        registration=RegistrationConfig(use_icp=False),
    )
    s = MoreSolver(model, params, cfg)
    pc1 = ref[:1]
    R_true = jnp.asarray(Rm[:1])
    pc2 = jnp.einsum("bij,bnj->bni", R_true, pc1)
    R, t = s.solve_pairwise_registration(pc1, pc2)
    rre = float(se3.rotation_error(R, R_true)[0])
    assert rre < 1.0, f"RRE {rre} deg with n_init=3"
