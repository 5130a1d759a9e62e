"""Multi-chip inference pipeline: 8-device dp sharding == single-device.

Validates the headline bench program (solver/pipeline.py) on the virtual
8-CPU mesh: identical matches/registrations with and without the mesh, and
the arrays actually land sharded on the scene axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
from livingscenes_tpu.parallel.sharding import make_mesh
from livingscenes_tpu.solver.pipeline import (
    PipelineConfig,
    build_scene_pair_pipeline,
)
from livingscenes_tpu.solver.registration import RegistrationConfig

TINY = ShapePriorConfig(
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
    approx_knn=False,  # virtual CPU devices: keep selection deterministic
)

S, O, N = 8, 4, 64


@pytest.fixture(scope="module")
def setup():
    model = ShapePrior(TINY)
    params = model.init_params(jax.random.PRNGKey(0), n_points=N)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    rng = np.random.default_rng(0)
    objs = rng.normal(size=(S, O, N, 3)).astype(np.float32)
    ref = objs + rng.uniform(-2, 2, (S, O, 1, 3)).astype(np.float32)
    perm = np.stack([rng.permutation(O) for _ in range(S)])
    rescan = np.stack([ref[s][perm[s]] for s in range(S)])
    rescan = rescan + rng.normal(size=(S, O, 1, 3)).astype(np.float32) * 0.1
    return model, params, jnp.asarray(ref), jnp.asarray(rescan)


def test_sharded_matches_single_device(setup):
    model, params, ref, rescan = setup
    cfg = PipelineConfig(
        registration=RegistrationConfig(use_icp=True, icp_iterations=5)
    )
    single = build_scene_pair_pipeline(model, cfg)
    out_single = single(params, ref, rescan)

    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    sharded = build_scene_pair_pipeline(model, cfg, mesh=mesh)
    out_sharded = sharded(params, ref, rescan)

    np.testing.assert_array_equal(
        np.asarray(out_single["matches0"]), np.asarray(out_sharded["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(out_single["R"]), np.asarray(out_sharded["R"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_single["t"]), np.asarray(out_sharded["t"]),
        atol=1e-5,
    )
    # Output really is sharded over the scene axis.
    shard_devs = {
        s.device for s in out_sharded["R"].addressable_shards
    }
    assert len(shard_devs) == 8


def test_sharded_optim_path_compiles(setup):
    """The optim=True (400-step refine) variant also runs sharded; use a
    short schedule to keep the test fast."""
    model, params, ref, rescan = setup
    cfg = PipelineConfig(
        optim=True,
        registration=RegistrationConfig(
            n_steps=5, lr_milestones=(3,), sinkhorn_iters=3,
            use_icp=True, icp_iterations=2,
        ),
    )
    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    sharded = build_scene_pair_pipeline(model, cfg, mesh=mesh)
    out = sharded(params, ref[:8], rescan[:8])
    assert np.all(np.isfinite(np.asarray(out["R"])))
    assert np.all(np.isfinite(np.asarray(out["t"])))


def test_sharded_grid_values_match_dense():
    """Query-point ("qp") sharded SDF grid evaluation == the single-device
    dense grid (the multi-chip form of the reference's chunked decoder
    loop, mesh_extractor2.py:141-156)."""
    from livingscenes_tpu.recon.grid import (
        dense_grid_values,
        sharded_dense_grid_values,
    )

    def sphere(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.4

    mesh = make_mesh(jax.devices()[:8], axis_names=("qp",))
    dense = dense_grid_values(sphere, resolution=24, box_size=1.1)
    sharded = sharded_dense_grid_values(sphere, 24, mesh, box_size=1.1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=1e-6
    )
    shard_devs = {s.device for s in sharded.addressable_shards}
    assert len(shard_devs) >= 1  # assembled grid; values proven equal
