"""s1 sampling-density augmentation + occ dataset modes
(VERDICT round-1 missing #5: shapenet_new2.py:433-549 and the hybrid/occ
dataset_mode at :26-27,218-227,294-297,355-365)."""
import os

import jax
import numpy as np
import pytest

from livingscenes_tpu.models.shape_prior import ShapePriorConfig
from livingscenes_tpu.models.sim3recon import SIM3Recon, TrainLossConfig
from livingscenes_tpu.train.data import (
    SamplingAugConfig,
    ShapeNetSDFDataset,
    SyntheticShapeDataset,
    batch_iterator,
    sampling_with_aug_s1,
)

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
)


def test_s1_output_is_resampled_input():
    rng = np.random.default_rng(0)
    pcl = rng.normal(size=(500, 3))
    cfg = SamplingAugConfig()
    for trial in range(5):
        out = sampling_with_aug_s1(pcl, 256, rng, cfg)
        assert out.shape == (256, 3)
        # every output point is an input point (pure resampling, no jitter)
        d = np.abs(out[:, None] - pcl[None]).sum(-1).min(1)
        assert d.max() == 0.0


def test_s1_halfspace_mode_skews_density():
    """Force the half-space single mode; the kept side must dominate."""
    rng = np.random.default_rng(1)
    pcl = rng.uniform(-1, 1, (2000, 3))
    cfg = SamplingAugConfig(
        mixing_prob=0.0,
        single_mode_ratio=(0.0, 0.0, 1.0),  # always half-space
        halfspace_num_range=(1, 1),
        halfspace_difference_range=(1.0, 1.0),  # fully remove one side
        sampling_range=(1.0, 1.0),  # no shrink, isolate the mode
    )
    # With full removal of one half-space through a random anchor, the
    # unique surviving points are a strict subset.
    out = sampling_with_aug_s1(pcl, 2000, rng, cfg)
    uniq = np.unique(out, axis=0)
    assert len(uniq) < 1600  # a substantial chunk was removed


def test_s1_shrink_duplicates():
    rng = np.random.default_rng(2)
    pcl = rng.normal(size=(1000, 3))
    cfg = SamplingAugConfig(
        mixing_prob=0.0,
        single_mode_ratio=(1.0, 0.0, 0.0),  # uniform
        sampling_range=(0.1, 0.1),  # keep only 10% then re-duplicate
    )
    out = sampling_with_aug_s1(pcl, 1000, rng, cfg)
    assert len(np.unique(out, axis=0)) <= 100


def _write_occ_tree(root):
    rng = np.random.default_rng(3)
    d = os.path.join(root, "03001627", "obj0")
    os.makedirs(d)
    pts = rng.uniform(-0.5, 0.5, (4096, 3)).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=-1) < 0.3).astype(np.uint8)
    np.savez(
        os.path.join(d, "points.npz"),
        points=pts,
        occupancies=np.packbits(occ),
    )
    surface = pts[occ > 0][:512]
    np.savez(os.path.join(d, "pointcloud.npz"), points=surface)
    return root


def test_occ_mode_dataset_and_loss(tmp_path):
    root = _write_occ_tree(str(tmp_path))
    ds = ShapeNetSDFDataset(
        data_root=root,
        dataset_mode="occ",
        field_mode="occ",
        n_pcl=64,
        n_uni=32,
        n_nss=0,
        n_eval=64,
        class_balanced=False,
    )
    assert len(ds) == 1
    item = ds[0]
    assert item["points_nss"].shape == (0, 3)
    assert set(np.unique(item["points_uni_value"])) <= {0.0, 1.0}

    batch = next(batch_iterator(ds, 1, loop=False))
    model = SIM3Recon(TINY, TrainLossConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    loss, metrics = model.loss(params, batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(metrics["loss_recon_nss"]) == 0.0


def test_occ_mode_requires_occ_field(tmp_path):
    with pytest.raises(AssertionError):
        ShapeNetSDFDataset(
            data_root=str(tmp_path), dataset_mode="occ", field_mode="sdf"
        )


def test_hybrid_occ_field_binarizes(tmp_path):
    rng = np.random.default_rng(4)
    d = os.path.join(str(tmp_path), "cat", "obj0")
    os.makedirs(d)
    pts = rng.uniform(-0.5, 0.5, (1024, 3)).astype(np.float32)
    sdf = (np.linalg.norm(pts, axis=-1) - 0.3).astype(np.float32)
    np.savez(os.path.join(d, "points_uni.npz"), points=pts, sdf=sdf)
    np.savez(os.path.join(d, "points_nss.npz"), points=pts, sdf=sdf)
    np.savez(os.path.join(d, "pointcloud.npz"), points=pts[:256])
    ds = ShapeNetSDFDataset(
        data_root=str(tmp_path),
        field_mode="occ",
        n_pcl=64,
        n_uni=32,
        n_nss=32,
        n_eval=32,
        class_balanced=False,
    )
    item = ds[0]
    assert set(np.unique(item["points_uni_value"])) <= {0.0, 1.0}
    assert set(np.unique(item["points_nss_value"])) <= {0.0, 1.0}


def test_synthetic_dataset_with_s1():
    ds = SyntheticShapeDataset(
        n_items=2, n_pcl=128, n_uni=32, n_nss=32, n_eval=32,
        sampling_aug=SamplingAugConfig(),
    )
    item = ds[0]
    assert item["inputs"].shape == (128, 3)
    assert np.isfinite(item["inputs"]).all()


def test_ram_cache_and_prefetch_value_identical():
    """The RAM cache and prefetch thread must not change a single byte:
    items are deterministic per (seed, idx), so cached==fresh, and the
    prefetch thread preserves batch order and values."""
    from livingscenes_tpu.train.data import prefetch_iterator
    from livingscenes_tpu.train.data import AugmentConfig

    kw = dict(n_items=8, n_pcl=64, n_uni=32, n_nss=32, n_eval=32,
              seed=5, aug=AugmentConfig())
    ds_plain = SyntheticShapeDataset(ram_cache=False, **kw)
    ds_cache = SyntheticShapeDataset(ram_cache=True, cache_workers=2, **kw)
    for i in range(len(ds_plain)):
        a, b = ds_plain[i], ds_cache[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    it1 = list(batch_iterator(ds_plain, 4, seed=7, loop=False))
    it2 = list(prefetch_iterator(batch_iterator(ds_cache, 4, seed=7, loop=False)))
    assert len(it1) == len(it2) == 2
    for b1, b2 in zip(it1, it2):
        for k in b1:
            np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
