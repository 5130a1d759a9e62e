import numpy as np

from livingscenes_tpu.eval import (
    compute_chamfer_distance,
    compute_sdf_recall,
    compute_volumetric_iou,
    distance_p2p,
    f_score,
    volumetric_iou_sampled,
)
from livingscenes_tpu.native.bindings import marching_isosurface
from livingscenes_tpu.recon.mesh import Mesh


def sphere_mesh(radius=0.5, n=49):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vals = radius - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching_isosurface(vals.astype(np.float32), 0.0)
    verts = verts / (n - 1) * 2 - 1
    return Mesh(verts.astype(np.float32), faces)


def test_chamfer_distance_zero_for_self():
    m = sphere_mesh()
    gt = m.sample_surface(5000, seed=3)
    cd1, cd2 = compute_chamfer_distance(gt, m, num_mesh_samples=10000)
    # 10k samples on a r=0.5 sphere: mean NN spacing ~0.018 -> sq ~3e-4
    assert cd1 < 1e-3 and cd2 < 1e-3


def test_chamfer_distance_detects_offset():
    m = sphere_mesh()
    gt = m.sample_surface(5000, seed=3) + np.array([0.3, 0, 0])
    cd1, _ = compute_chamfer_distance(gt, m, num_mesh_samples=10000)
    assert cd1 > 1e-3


def test_volumetric_iou_containment():
    big = sphere_mesh(0.6)
    small = sphere_mesh(0.3)
    assert compute_volumetric_iou(big, small) > 0.9  # small inside big
    assert compute_volumetric_iou(small, big) < 0.05


def test_volumetric_iou_sampled_analytic():
    """IoU of r=0.6 and r=0.3 spheres = (0.3/0.6)^3 = 0.125."""
    big = sphere_mesh(0.6)
    small = sphere_mesh(0.3)
    iou = volumetric_iou_sampled(big, small, n_samples=50000)
    assert abs(iou - 0.125) < 0.02


def test_sdf_recall():
    m1 = sphere_mesh(0.5)
    m2 = sphere_mesh(0.5)
    assert compute_sdf_recall(m1, m2, thres=0.05) > 0.99
    m3 = sphere_mesh(0.8)
    assert compute_sdf_recall(m1, m3, thres=0.05) < 0.05


def test_f_score_and_p2p():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000, 3)).astype(np.float32)
    d = distance_p2p(a, a)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    assert f_score(a, a, threshold=1e-5) == 1.0
    b = a + 0.2
    assert f_score(a, b, threshold=0.05) < 0.5


def test_empty_mesh_metrics():
    empty = Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    full = sphere_mesh()
    assert compute_volumetric_iou(empty, full) == 0.0
    assert compute_sdf_recall(empty, full) == 0.0
