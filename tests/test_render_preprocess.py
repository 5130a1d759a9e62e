"""Depth rasterizer, back-projection, and preprocessing pipeline tests."""
import numpy as np

from livingscenes_tpu.native.bindings import marching_isosurface
from livingscenes_tpu.recon.mesh import Mesh
from livingscenes_tpu.recon.render import (
    Camera,
    backproject_depth,
    look_at,
    render_depth,
    render_partial_clouds,
)
from livingscenes_tpu.tools.preprocess import compute_sdf, preprocess_mesh


def sphere_mesh(radius=0.4, n=49):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vals = radius - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching_isosurface(vals.astype(np.float32), 0.0)
    verts = verts / (n - 1) * 2 - 1
    return Mesh(verts.astype(np.float32), faces)


def test_render_depth_sphere():
    m = sphere_mesh()
    eye = np.array([2.0, 0.0, 0.0])
    R, t = look_at(eye, np.zeros(3))
    cam = Camera(width=120, height=120, fx=120, fy=120)
    depth = render_depth(m, R, t, cam)
    assert depth.shape == (120, 120)
    hit = depth[depth > 0]
    assert len(hit) > 500
    # nearest visible depth = distance to sphere front = 2 - 0.4
    assert abs(hit.min() - 1.6) < 0.02
    # center pixel hits the sphere head-on
    assert abs(depth[60, 60] - 1.6) < 0.02


def test_backprojection_lands_on_surface():
    m = sphere_mesh()
    eye = np.array([0.0, 2.0, 0.5])
    R, t = look_at(eye, np.zeros(3))
    cam = Camera(width=100, height=100, fx=100, fy=100)
    depth = render_depth(m, R, t, cam)
    pts = backproject_depth(depth, R, t, cam)
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.4, atol=0.02)
    assert r.max() < 0.45
    # only the camera-facing hemisphere is seen
    visibility = pts @ (eye / np.linalg.norm(eye))
    assert (visibility > -0.05).mean() > 0.95


def test_render_partial_clouds_views():
    m = sphere_mesh()
    clouds = render_partial_clouds(
        m, n_views=3, camera=Camera(width=80, height=80, fx=80, fy=80),
        max_points_per_view=500,
    )
    assert len(clouds) == 3
    for c in clouds:
        assert 0 < len(c) <= 500
        np.testing.assert_allclose(
            np.linalg.norm(c, axis=-1).mean(), 0.4, atol=0.03
        )


def test_compute_sdf_signs():
    m = sphere_mesh()
    q = np.array([[0, 0, 0], [0.9, 0, 0], [0.39, 0, 0], [0, 0, 0.41]], np.float32)
    sdf = compute_sdf(m, q, n_surface=20000)
    np.testing.assert_allclose(sdf, [-0.4, 0.5, -0.01, 0.01], atol=0.02)


def test_preprocess_mesh_layout(tmp_path):
    m = sphere_mesh()
    out = tmp_path / "obj0"
    preprocess_mesh(
        m, str(out), n_pointcloud=2000, n_uni=3000, n_nss=3000,
        n_views=2, camera=Camera(width=64, height=64, fx=64, fy=64),
    )
    pc = np.load(out / "pointcloud.npz")["points"]
    assert pc.shape == (2000, 3)
    uni = np.load(out / "points_uni.npz")
    assert uni["points"].shape == (3000, 3) and uni["sdf"].shape == (3000,)
    # sign consistency: points near origin are inside (sdf < 0)
    near_center = np.linalg.norm(uni["points"], axis=-1) < 0.2
    assert (uni["sdf"][near_center] < 0).mean() > 0.95
    assert (out / "dep_pcl_0.npz").exists() and (out / "dep_pcl_1.npz").exists()
    # the produced layout round-trips through the training dataset reader
    import shutil
    root = tmp_path / "root" / "cat"
    root.mkdir(parents=True)
    shutil.copytree(out, root / "obj0")
    from livingscenes_tpu.train.data import ShapeNetSDFDataset
    ds = ShapeNetSDFDataset(str(tmp_path / "root"), n_pcl=256, n_uni=64,
                            n_nss=64, n_eval=64, input_mode="dep")
    item = ds[0]
    assert item["inputs"].shape == (256, 3)
    assert np.isfinite(item["points_uni_value"]).all()


def test_shapenet_dataset_ram_cache(tmp_path):
    """ram_cache preloads npz payloads (dataset_base.py:71-84 role) and
    produces identical items to the disk path."""
    m = sphere_mesh()
    root = tmp_path / "root" / "cat"
    root.mkdir(parents=True)
    preprocess_mesh(
        m, str(root / "obj0"), n_pointcloud=500, n_uni=600, n_nss=600,
        n_views=2, camera=Camera(width=48, height=48, fx=48, fy=48),
    )
    from livingscenes_tpu.train.data import ShapeNetSDFDataset

    kw = dict(n_pcl=64, n_uni=32, n_nss=32, n_eval=32, input_mode="dep")
    ds_disk = ShapeNetSDFDataset(str(tmp_path / "root"), **kw)
    ds_ram = ShapeNetSDFDataset(str(tmp_path / "root"), ram_cache=True, **kw)
    a, b = ds_disk[0], ds_ram[0]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_robust_res_and_memory_stats():
    import jax.numpy as jnp
    from livingscenes_tpu.se3 import get_robust_res
    from livingscenes_tpu.utils.debugging import device_memory_stats

    res = jnp.asarray([0.01, 0.5, -0.3])
    robust, w2 = get_robust_res(res, b=0.02)
    assert robust.shape == (3, 1, 1)
    # small residuals keep weight 1; large ones are downweighted
    assert abs(float(w2[0, 0, 0]) - 1.0) < 1e-5
    assert float(w2[1, 0, 0]) < 0.1
    stats = device_memory_stats()
    assert isinstance(stats, dict)
