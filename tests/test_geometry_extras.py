"""Tests: VN pooling layers, PCNet, voxelization, mesh evaluator, PNG viz,
binvox IO."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu.native.bindings import marching_isosurface, voxelize_mesh
from livingscenes_tpu.nn.encoders import PCNet
from livingscenes_tpu.nn.vec_layers import VecMaxPool, VecMaxPoolV2
from livingscenes_tpu.eval.mesh_eval import MeshEvaluator
from livingscenes_tpu.recon.mesh import Mesh
from livingscenes_tpu.utils.binvox import VoxelGrid, read_binvox, write_binvox
from livingscenes_tpu.utils.viz import (
    render_mesh_image,
    render_pointcloud_image,
    visualize_shape_matching,
    write_png,
)

B, N, C = 2, 20, 8


def f64(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float64), tree)


def sphere_mesh(radius=0.4, n=33):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vals = radius - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching_isosurface(vals.astype(np.float32), 0.0)
    return Mesh((verts / (n - 1) * 2 - 1).astype(np.float32), faces)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (VecMaxPool, dict(softmax_factor=1.0, k_prediction="lin")),
        (VecMaxPool, dict(softmax_factor=1.0, k_prediction="mean")),
        (VecMaxPool, dict(softmax_factor=-1.0, k_prediction="lin")),
        (VecMaxPoolV2, dict(softmax_factor=1.0)),
        (VecMaxPoolV2, dict(softmax_factor=-1.0)),
    ],
)
@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_pool_equivariance(rng, cls, kwargs, mode):
    pool = cls(in_features=C, mode=mode, **kwargs)
    x = jnp.asarray(rng.normal(size=(B, N, C, 3)))
    params = f64(pool.init(jax.random.PRNGKey(0), x))
    y = pool.apply(params, x)
    assert y.shape == (B, C, 3)

    R = jnp.asarray(Rotation.random(B, random_state=0).as_matrix())
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=(B,)))
    t = (
        jnp.asarray(rng.normal(size=(B, 3)))
        if mode == "se3"
        else jnp.zeros((B, 3))
    )
    x_aug = (
        jnp.einsum("bij,bncj->bnci", R, x * s[:, None, None, None])
        + t[:, None, None, :]
    )
    y_aug = pool.apply(params, x_aug)
    expected = (
        jnp.einsum("bij,bcj->bci", R, y * s[:, None, None]) + t[:, None, :]
    )
    np.testing.assert_allclose(np.asarray(y_aug), np.asarray(expected), atol=1e-9)


def test_pcnet_shapes(rng):
    enc = PCNet(latent_dim=64, output_dim=16)
    x = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    center, scale, z_so3, z_inv = enc.apply(params, x)
    assert center.shape == (2, 1, 3)
    assert scale.shape == (2,)
    assert z_so3.shape == (2, 16, 3)
    assert z_inv.shape == (2, 16)


def test_voxelize_sphere_shell():
    m = sphere_mesh()
    occ = voxelize_mesh(m.vertices, m.faces, 24)
    assert occ.shape == (24, 24, 24)
    idx = np.argwhere(occ)
    centers = (idx + 0.5) / 24 * 0.8 - 0.4
    r = np.linalg.norm(centers, axis=-1)
    # surface voxelization: occupied voxels hug the radius
    assert abs(r.mean() - 0.4) < 0.03
    assert occ.sum() > 200


def test_mesh_evaluator_self():
    m = sphere_mesh()
    gt_pc, gt_n = m.sample_surface(20000, seed=1, return_normals=True)
    ev = MeshEvaluator(n_points=20000, fscore_threshold=0.01)
    out = ev.eval_mesh(m, gt_pc, gt_n)
    assert out["chamfer_l1"] < 0.01
    assert out["normals"] > 0.97
    assert out["fscore"] > 0.95


def test_mesh_evaluator_detects_mismatch():
    small, big = sphere_mesh(0.3), sphere_mesh(0.6)
    gt_pc, gt_n = big.sample_surface(10000, seed=1, return_normals=True)
    ev = MeshEvaluator(n_points=10000)
    out = ev.eval_mesh(small, gt_pc, gt_n)
    assert out["chamfer_l1"] > 0.1


def test_mesh_evaluator_iou():
    m = sphere_mesh(0.4)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.6, 0.6, (5000, 3)).astype(np.float32)
    occ_gt = np.linalg.norm(pts, axis=-1) < 0.4
    ev = MeshEvaluator(n_points=5000)
    out = ev.eval_mesh(
        m, m.sample_surface(5000), points_iou=pts, occ_tgt=occ_gt
    )
    assert out["iou"] > 0.9


def test_png_and_renders(tmp_path, rng):
    pts = [rng.normal(size=(200, 3)) * 0.3, rng.normal(size=(200, 3)) * 0.3 + 1.5]
    img = render_pointcloud_image(pts, size=80)
    assert img.shape == (80, 80, 3)
    assert (img < 250).any()  # something was drawn
    write_png(str(tmp_path / "pc.png"), img)
    data = (tmp_path / "pc.png").read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"

    mimg = render_mesh_image(sphere_mesh(), size=64)
    assert mimg.shape == (64, 64, 3)
    assert (mimg < 250).any()

    match_img = visualize_shape_matching(
        pts, pts[::-1], np.array([1, 0]), size=64
    )
    assert match_img.shape == (64, 128, 3)


def test_binvox_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    grid = VoxelGrid(
        rng.random((16, 16, 16)) > 0.7, translate=(0.1, 0.2, 0.3), scale=2.0
    )
    path = str(tmp_path / "g.binvox")
    write_binvox(path, grid)
    back = read_binvox(path)
    np.testing.assert_array_equal(back.data, grid.data)
    np.testing.assert_allclose(back.translate, grid.translate)
    assert back.scale == grid.scale


def test_visualize_registration_panels(rng):
    from livingscenes_tpu.utils.viz import visualize_registration

    src = rng.normal(size=(100, 3)) * 0.3
    tgt = src + [1.0, 0, 0]
    tsfm = np.eye(4)
    tsfm[:3, 3] = [1.0, 0, 0]
    img = visualize_registration(src, tgt, tsfm, tsfm, size=64)
    assert img.shape == (64, 192, 3)
