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


def test_sharded_optim_path_matches_single_device(setup):
    """The optim=True (400-step refine) production relocalization variant:
    8-device == 1-device EQUALITY (not just finiteness); short schedule to
    keep the test fast — the program structure (refine scan + Sinkhorn +
    ICP) is the production one."""
    model, params, ref, rescan = setup
    cfg = PipelineConfig(
        optim=True,
        registration=RegistrationConfig(
            n_steps=5, lr_milestones=(3,), sinkhorn_iters=3,
            use_icp=True, icp_iterations=2,
        ),
    )
    single = build_scene_pair_pipeline(model, cfg)
    out_single = single(params, ref, rescan)

    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    sharded = build_scene_pair_pipeline(model, cfg, mesh=mesh)
    out_sharded = sharded(params, ref, rescan)

    np.testing.assert_array_equal(
        np.asarray(out_single["matches0"]),
        np.asarray(out_sharded["matches0"]),
    )
    np.testing.assert_allclose(
        np.asarray(out_single["R"]), np.asarray(out_sharded["R"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_single["t"]), np.asarray(out_sharded["t"]), atol=1e-5
    )
    shard_devs = {s.device for s in out_sharded["R"].addressable_shards}
    assert len(shard_devs) == 8


def test_full_end2end_sharded_matches_single_device(setup):
    """The COMPLETE _solve_end2end program (encode_fps front end -> match
    -> register -> code transport -> hierarchical occupancy grids): 8-dev
    == 1-dev on every output, grids included."""
    model, params, ref, rescan = setup
    cfg = PipelineConfig(
        registration=RegistrationConfig(use_icp=True, icp_iterations=3),
        encode_fps=True,
        recon=True,
        recon_resolution0=8,
        recon_upsampling_steps=1,
        recon_chunk=512,
    )
    mask = jnp.ones((S, O, N), bool)
    single = build_scene_pair_pipeline(model, cfg)
    out_single = single(params, ref, rescan, mask, mask)

    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    sharded = build_scene_pair_pipeline(model, cfg, mesh=mesh)
    out_sharded = sharded(params, ref, rescan, mask, mask)

    np.testing.assert_array_equal(
        np.asarray(out_single["matches0"]),
        np.asarray(out_sharded["matches0"]),
    )
    # default recon_final_merge="host" ships the pre-merge grid + payload
    for key in ("R", "t", "grids_premerge", "grid_fidx", "grid_fvals",
                "recon_s", "recon_t"):
        np.testing.assert_allclose(
            np.asarray(out_single[key]),
            np.asarray(out_sharded[key]),
            atol=2e-5,
            err_msg=key,
        )
    shard_devs = {
        s.device for s in out_sharded["grids_premerge"].addressable_shards
    }
    assert len(shard_devs) == 8


def test_extract_scene_meshes_shapes(setup):
    """Host mesh stage consumes pipeline output: one row per scene, None
    for unmatched instances, Mesh objects otherwise."""
    from livingscenes_tpu.recon.extractor import MeshExtractorConfig
    from livingscenes_tpu.solver.pipeline import extract_scene_meshes

    model, params, ref, rescan = setup
    cfg = PipelineConfig(
        registration=RegistrationConfig(use_icp=False),
        recon=True,
        recon_resolution0=8,
        recon_upsampling_steps=0,
        recon_chunk=512,
    )
    pipe = build_scene_pair_pipeline(model, cfg)
    out = pipe(params, ref[:2], rescan[:2])
    meshes = extract_scene_meshes(
        out,
        MeshExtractorConfig(
            resolution0=8, upsampling_steps=0, simplify_nfaces=None
        ),
    )
    assert len(meshes) == 2 and len(meshes[0]) == O
    m0 = np.asarray(out["matches0"])
    for i in range(2):
        for j in range(O):
            if m0[i, j] < 0:
                assert meshes[i][j] is None
            else:
                assert hasattr(meshes[i][j], "vertices")


def test_pipeline_host_final_merge_matches_device(setup):
    """recon_final_merge='host': the pipeline ships the last refine
    level as (idx, vals) and extract_scene_meshes applies it — identical
    meshes to the device-merged program (the grids output itself differs:
    it is the pre-merge trilinear upsample)."""
    from livingscenes_tpu.recon.extractor import MeshExtractorConfig
    from livingscenes_tpu.recon.grid import apply_final_merge
    from livingscenes_tpu.solver.pipeline import extract_scene_meshes

    model, params, ref, rescan = setup
    base = dict(
        registration=RegistrationConfig(use_icp=False),
        recon=True,
        recon_resolution0=8,
        recon_upsampling_steps=1,
        recon_chunk=512,
    )
    out_dev = build_scene_pair_pipeline(
        model, PipelineConfig(**base, recon_final_merge="device")
    )(params, ref[:2], rescan[:2])
    out_host = build_scene_pair_pipeline(
        model, PipelineConfig(**base, recon_final_merge="host")
    )(params, ref[:2], rescan[:2])
    # merged grids equal the device-scattered grids bit-for-bit; the
    # pending merge is explicit in the key name (ADVICE r4)
    assert "grids" not in out_host
    g_host = np.asarray(out_host["grids_premerge"])
    fidx = np.asarray(out_host["grid_fidx"])
    fvals = np.asarray(out_host["grid_fvals"])
    for i in range(2):
        for j in range(O):
            merged = apply_final_merge(g_host[i, j], fidx[i, j], fvals[i, j])
            np.testing.assert_array_equal(
                merged, np.asarray(out_dev["grids"][i, j])
            )
    mcfg = MeshExtractorConfig(
        resolution0=8, upsampling_steps=1, simplify_nfaces=None
    )
    meshes_dev = extract_scene_meshes(out_dev, mcfg)
    meshes_host = extract_scene_meshes(out_host, mcfg)
    for md_row, mh_row in zip(meshes_dev, meshes_host):
        for md, mh in zip(md_row, mh_row):
            assert (md is None) == (mh is None)
            if md is not None:
                np.testing.assert_array_equal(
                    np.asarray(md.vertices), np.asarray(mh.vertices)
                )


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


def test_mesh_extractor_qp_sharded_matches_unsharded(setup):
    """MeshExtractor with a qp mesh (hierarchical path, the production
    extraction config shape) == the unsharded extractor — the wiring of
    query-point sharding into the actual product path, not just the
    standalone grid helper."""
    from livingscenes_tpu.recon.extractor import (
        MeshExtractor,
        MeshExtractorConfig,
    )

    model, params, ref, _ = setup
    codes = model.encode(params, ref[0])
    one = jax.tree.map(lambda x: x[:1], codes)

    ext_cfg = MeshExtractorConfig(
        resolution0=8, upsampling_steps=1, simplify_nfaces=None,
        points_batch_size=512,
    )
    logits = lambda q, c: model.occupancy_logits(params, q, c)
    plain = MeshExtractor(logits, ext_cfg)
    qp_mesh = make_mesh(jax.devices()[:8], axis_names=("qp",))
    shard = MeshExtractor(logits, ext_cfg, mesh=qp_mesh)

    canonical = dict(
        one, s=jnp.ones_like(one["s"]), t=jnp.zeros_like(one["t"])
    )
    g0, _ = plain._grid_fn(canonical)
    g1, _ = shard._grid_fn(canonical)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), atol=2e-5
    )
