"""Reconstruction pipeline tests against analytic SDFs (no neural net):
grid evaluation, hierarchical refinement vs dense parity, native isosurface
extraction + simplification, mesh utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.recon import (
    Mesh,
    MeshExtractor,
    MeshExtractorConfig,
    dense_grid_values,
    hierarchical_grid_values,
)

RADIUS = 0.35


def sphere_logits(pts):
    """Occupancy logits of a sphere: positive inside (logits = -sdf)."""
    return RADIUS - jnp.linalg.norm(pts, axis=-1)


def sphere_logits_codes(query, codes):
    c = codes["t"][:, 0]
    return RADIUS * codes["s"][:, None] - jnp.linalg.norm(
        query - c[:, None], axis=-1
    )


def test_dense_grid_shape_and_values():
    vals = dense_grid_values(sphere_logits, resolution=16, box_size=1.1)
    assert vals.shape == (17, 17, 17)
    # center value = RADIUS, corner negative
    np.testing.assert_allclose(float(vals[8, 8, 8]), RADIUS, atol=1e-6)
    assert float(vals[0, 0, 0]) < 0


def test_hierarchical_matches_dense_near_surface():
    dense = dense_grid_values(sphere_logits, resolution=32, box_size=1.1)
    hier = hierarchical_grid_values(
        sphere_logits,
        resolution0=8,
        upsampling_steps=2,
        threshold=0.0,
        box_size=1.1,
    )
    assert hier.shape == dense.shape
    d = np.asarray(dense)
    h = np.asarray(hier)
    # Exact where re-evaluated (near surface); elsewhere interpolated but
    # sign-correct.
    near = np.abs(d) < 0.05
    np.testing.assert_allclose(h[near], d[near], atol=1e-6)
    np.testing.assert_array_equal(h > 0, d > 0)


def test_select_modes_and_dedup_agree():
    """packsort (production) selects the identical point set as the
    closeness top_k while the cap has headroom — grids bit-equal; the
    no-dedup form re-decodes coarse-lattice points through a different
    chunk shape, equal to fp fusion noise (~1 ulp)."""
    kw = dict(
        resolution0=8, upsampling_steps=2, threshold=0.0, box_size=1.1
    )
    ref = hierarchical_grid_values(sphere_logits, select_mode="topk", **kw)
    pack = hierarchical_grid_values(
        sphere_logits, select_mode="packsort", **kw
    )
    np.testing.assert_array_equal(np.asarray(pack), np.asarray(ref))
    nd = hierarchical_grid_values(
        sphere_logits, select_mode="packsort", dedup=False, **kw
    )
    np.testing.assert_allclose(
        np.asarray(nd), np.asarray(ref), rtol=0, atol=3e-7
    )
    with pytest.raises(ValueError):
        hierarchical_grid_values(sphere_logits, select_mode="bogus", **kw)


def test_host_final_merge_equals_device_merge():
    """final_merge='host' + apply_final_merge reproduces the device
    scatter bit-for-bit (same idx/vals, same drop semantics)."""
    from livingscenes_tpu.recon.grid import apply_final_merge

    kw = dict(
        resolution0=8, upsampling_steps=2, threshold=0.0, box_size=1.1
    )
    dev = hierarchical_grid_values(sphere_logits, **kw)
    host_grid, stats = hierarchical_grid_values(
        sphere_logits, final_merge="host", return_stats=True, **kw
    )
    merged = apply_final_merge(
        np.asarray(host_grid), stats["final_idx"], stats["final_vals"]
    )
    np.testing.assert_array_equal(merged, np.asarray(dev))
    with pytest.raises(ValueError):
        hierarchical_grid_values(sphere_logits, final_merge="host", **kw)
    with pytest.raises(ValueError):
        hierarchical_grid_values(sphere_logits, final_merge="bogus", **kw)


def test_select_modes_diverge_only_under_overflow():
    """With a binding cap the two modes may pick different survivors —
    but both must still report the same overflow count and keep the
    sign structure of the sphere away from the dropped band."""
    kw = dict(
        resolution0=8,
        upsampling_steps=1,
        threshold=0.0,
        box_size=1.1,
        refine_cap_factor=2,  # far below the sphere's active count
        return_stats=True,
    )
    v_t, s_t = hierarchical_grid_values(
        sphere_logits, select_mode="topk", **kw
    )
    v_p, s_p = hierarchical_grid_values(
        sphere_logits, select_mode="packsort", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(s_t["overflow"]), np.asarray(s_p["overflow"])
    )
    assert int(s_t["overflow"][0]) > 0
    dense = dense_grid_values(sphere_logits, resolution=16, box_size=1.1)
    for v in (v_t, v_p):
        np.testing.assert_array_equal(
            np.asarray(v) > 0, np.asarray(dense) > 0
        )


def test_extractor_sphere_geometry():
    cfg = MeshExtractorConfig(
        resolution0=16, upsampling_steps=1, simplify_nfaces=None
    )
    ex = MeshExtractor(sphere_logits_codes, cfg)
    codes = {
        "s": jnp.ones((1,)),
        "t": jnp.zeros((1, 1, 3)),
        "z_inv": jnp.zeros((1, 4)),
        "z_so3": jnp.zeros((1, 4, 3)),
    }
    mesh = ex.generate_from_codes(codes)
    assert not mesh.is_empty
    r = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(r.mean(), RADIUS, atol=0.01)
    assert r.max() < RADIUS + 0.03 and r.min() > RADIUS - 0.03


def test_extractor_applies_scale_translation():
    cfg = MeshExtractorConfig(
        resolution0=16, upsampling_steps=1, simplify_nfaces=None
    )
    ex = MeshExtractor(sphere_logits_codes, cfg)
    codes = {
        "s": jnp.asarray([2.0]),
        "t": jnp.asarray([[[0.3, -0.2, 0.1]]]),
        "z_inv": jnp.zeros((1, 4)),
        "z_so3": jnp.zeros((1, 4, 3)),
    }
    mesh = ex.generate_from_codes(codes)
    center = mesh.vertices.mean(0)
    np.testing.assert_allclose(center, [0.3, -0.2, 0.1], atol=0.02)
    r = np.linalg.norm(mesh.vertices - center, axis=-1)
    np.testing.assert_allclose(r.mean(), 2.0 * RADIUS, atol=0.02)


def test_extractor_simplify_cap():
    cfg = MeshExtractorConfig(
        resolution0=16, upsampling_steps=1, simplify_nfaces=300
    )
    ex = MeshExtractor(sphere_logits_codes, cfg)
    codes = {
        "s": jnp.ones((1,)),
        "t": jnp.zeros((1, 1, 3)),
        "z_inv": jnp.zeros((1, 4)),
        "z_so3": jnp.zeros((1, 4, 3)),
    }
    mesh = ex.generate_from_codes(codes)
    assert 0 < len(mesh.faces) <= 330  # small tolerance over target
    r = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(r.mean(), RADIUS, atol=0.03)


def test_empty_field_gives_empty_mesh():
    cfg = MeshExtractorConfig(resolution0=8, upsampling_steps=0)
    ex = MeshExtractor(lambda q, c: jnp.full(q.shape[:-1], -5.0), cfg)
    codes = {"s": jnp.ones((1,)), "t": jnp.zeros((1, 1, 3))}
    mesh = ex.generate_from_codes(codes)
    assert mesh.is_empty


def test_mesh_surface_sampling_and_io(tmp_path):
    m = Mesh.placeholder_box(2.0)
    pts = m.sample_surface(1000, seed=1)
    assert pts.shape == (1000, 3)
    assert np.abs(pts).max() <= 1.0 + 1e-6
    # on the surface: at least one |coord| == 1
    assert np.all(np.isclose(np.abs(pts), 1.0, atol=1e-6).any(axis=1))
    m.export_obj(str(tmp_path / "box.obj"))
    m.export_ply(str(tmp_path / "box.ply"))
    assert (tmp_path / "box.obj").read_text().startswith("v ")
    assert (tmp_path / "box.ply").stat().st_size > 100


def test_mesh_apply_transform():
    m = Mesh.placeholder_box(1.0)
    tsfm = np.eye(4)
    tsfm[:3, 3] = [1.0, 2.0, 3.0]
    m.apply_transform(tsfm)
    np.testing.assert_allclose(m.vertices.mean(0), [1.0, 2.0, 3.0], atol=1e-6)


def test_simplify_reaches_target_on_sliver_heavy_mesh():
    """Marching-tetrahedra output is full of zero-area slivers whose
    collapse cost is ~0 but whose collapse often flips a neighbor normal.
    The lazy-heap simplifier must still reach the face target (an earlier
    deferral scheme span at the heap top on these and stalled)."""
    import numpy as np
    from livingscenes_tpu.native.bindings import (
        marching_isosurface,
        simplify_mesh,
    )

    res = 97
    idx = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    grid = (
        np.sqrt(X**2 + Y**2 + Z**2)
        - 0.7
        + 0.08 * np.sin(8 * X) * np.cos(8 * Y) * np.sin(6 * Z)
    ).astype(np.float32)
    v, f = marching_isosurface(grid, 0.0)
    assert len(f) > 50000
    v2, f2 = simplify_mesh(v, f, 4000)
    assert len(f2) <= 4000 * 1.02
    # Surface stays put: simplified verts near the original surface.
    from livingscenes_tpu.native.bindings import KDTree

    tree = KDTree(v.astype(np.float32))
    d, _ = tree.query(v2.astype(np.float32))
    assert float(np.mean(d)) < 1.0  # voxel units


def test_isosurface_watertight_at_word_boundary_sizes():
    """The marching-tetrahedra cell scan packs the (value > iso) field
    into 64-bit words along z; an off-by-one at a word boundary would
    silently skip a cell column and open holes. A sphere surface away
    from the grid boundary must be closed: every undirected edge shared
    by exactly two faces, and Euler characteristic V - E + F == 2.

    The mesh must also be consistently ORIENTED: every directed
    half-edge appears exactly once (its twin runs the other way) and
    every face normal points toward lower field values — outward for
    this inside-positive sphere. (Regression: the 8 single-corner
    marching-tet cases originally wound opposite to the 6 quad cases,
    yielding a non-orientable soup with ~26% duplicated half-edges.)"""
    import numpy as np

    from livingscenes_tpu.native.bindings import marching_isosurface

    for res in (17, 63, 64, 65, 66, 97):
        idx = np.linspace(-1, 1, res)
        X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
        grid = (0.72 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)
        v, f = marching_isosurface(grid, 0.0)
        assert len(f) > 0, res
        edges = np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0
        )
        sorted_edges = np.sort(edges, axis=1)
        _, counts = np.unique(sorted_edges, axis=0, return_counts=True)
        assert (counts == 2).all(), (res, np.bincount(counts))
        n_edges = counts.shape[0]
        assert len(v) - n_edges + len(f) == 2, res
        # Orientation: no directed half-edge repeats...
        _, dcounts = np.unique(edges, axis=0, return_counts=True)
        assert (dcounts == 1).all(), (res, np.bincount(dcounts))
        # ...and every normal points away from the sphere center.
        tri = v[f]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        outward = tri.mean(1) - (res - 1) / 2.0
        assert (np.einsum("ij,ij->i", nrm, outward) > 0).all(), res


def test_bf16_grid_mesh_accuracy():
    """recon_bf16 / occupancy_logits(matmul_dtype=bfloat16): the mesh
    extracted from a bf16-decoded hierarchical grid must sit within a
    fraction of a voxel of the f32 mesh, measured as symmetric chamfer on
    the committed trained checkpoint's real fields (VERDICT r4 ask #7 —
    the decision test scripts/measure_recon.py --accuracy cites; the
    knob's throughput side is measured there)."""
    import os

    from livingscenes_tpu.eval.run_flyingshape import load_solver
    from livingscenes_tpu.native.bindings import KDTree
    from livingscenes_tpu.recon.extractor import (
        MeshExtractorConfig,
        extract_mesh_from_grid,
    )
    from livingscenes_tpu.recon.grid import batched_hierarchical_grid_values
    from livingscenes_tpu.train.data import SyntheticShapeDataset

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "weights",
        "plateau_r4_selected.ckpt",
    )
    if not os.path.exists(ckpt):
        pytest.skip("committed checkpoint not present")
    solver = load_solver(ckpt, fast=False)
    model, params = solver.model, solver.params

    ds = SyntheticShapeDataset(n_items=1, n_pcl=512)
    rng = np.random.default_rng(21)
    clouds = [
        ds._surface_points(ds._shape_sdf(rng), rng, 512) for _ in range(2)
    ]
    codes = model.encode(params, jnp.asarray(np.stack(clouds), jnp.float32))
    canonical = dict(
        codes, s=jnp.ones_like(codes["s"]), t=jnp.zeros_like(codes["t"])
    )

    # 33^3 grids keep the CPU decode tractable; voxel-relative bound is
    # resolution-independent
    cfg = MeshExtractorConfig(
        resolution0=16, upsampling_steps=1, simplify_nfaces=None
    )
    kw = dict(
        resolution0=16,
        upsampling_steps=1,
        threshold=cfg.logit_threshold,
        box_size=cfg.box_size,
        chunk_size=4096,
        refine_cap_factor=20,
    )
    mk = lambda mm: jax.jit(
        lambda c: batched_hierarchical_grid_values(
            lambda q, ci: model.occupancy_logits(
                params, q, ci, matmul_dtype=mm
            ),
            c,
            **kw,
        )
    )(canonical)[0]
    g32 = np.asarray(mk(None), np.float32)
    g16 = np.asarray(mk(jnp.bfloat16), np.float32)

    voxel = cfg.box_size / cfg.final_resolution
    n_ok = 0
    for i in range(len(clouds)):
        m32 = extract_mesh_from_grid(g32[i], cfg)
        m16 = extract_mesh_from_grid(g16[i], cfg)
        assert m32.is_empty == m16.is_empty
        if m32.is_empty:
            continue
        a = m32.sample_surface(20000, seed=0).astype(np.float32)
        b = m16.sample_surface(20000, seed=0).astype(np.float32)
        ch = 0.5 * (
            np.mean(KDTree(b).query(a)[0]) + np.mean(KDTree(a).query(b)[0])
        )
        assert ch < 0.5 * voxel, (i, ch, voxel)
        n_ok += 1
    assert n_ok >= 1, "trained-checkpoint shapes must produce meshes"
