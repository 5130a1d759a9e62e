"""Integration tests of the shape prior: codes pytree, SIM(3) consistency of
the full encode -> decode pipeline (reference behavior at
model_utils.py:165-263)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu.models.shape_prior import (
    ShapePrior,
    ShapePriorConfig,
    concat_codes,
    slice_codes,
    transform_codes,
)

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
    n_pcl=64,
)


def f64(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float64), tree)


@pytest.fixture(scope="module")
def model_params_pc():
    model = ShapePrior(SMALL)
    params = f64(model.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(3)
    pc = jnp.asarray(rng.normal(size=(2, 64, 3)) * 0.4 + 1.0)
    return model, params, pc


def test_codes_pytree_shapes(model_params_pc):
    model, params, pc = model_params_pc
    codes = model.encode(params, pc)
    assert codes["z_so3"].shape == (2, 32, 3)
    assert codes["z_inv"].shape == (2, 32)
    assert codes["s"].shape == (2,)
    assert codes["t"].shape == (2, 1, 3)


def test_encode_equivariance_sim3(model_params_pc):
    """codes(s.R.x + t) must equal the transported codes (the property that
    makes matching + Kabsch-on-codes registration work)."""
    model, params, pc = model_params_pc
    codes = model.encode(params, pc)

    R = jnp.asarray(Rotation.random(2, random_state=5).as_matrix())
    s = jnp.asarray([1.4, 0.6])
    t = jnp.asarray(np.random.default_rng(8).normal(size=(2, 3)))
    pc_aug = jnp.einsum("bij,bnj->bni", R, pc * s[:, None, None]) + t[:, None]
    codes_aug = model.encode(params, pc_aug)

    np.testing.assert_allclose(
        np.asarray(codes_aug["z_inv"]), np.asarray(codes["z_inv"]), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(codes_aug["s"]), np.asarray(codes["s"] * s), rtol=1e-8
    )
    z_rot = jnp.einsum("bij,bcj->bci", R, codes["z_so3"])
    np.testing.assert_allclose(
        np.asarray(codes_aug["z_so3"]), np.asarray(z_rot), atol=1e-8
    )
    # Note: the reference adds the predicted center correction to the
    # centroid without re-multiplying by scale0 (model_utils.py:181-184),
    # so `t` is SE(3)- but not exactly SIM(3)-equivariant. Check `t`
    # transport under pure rigid motion (s = 1).
    pc_rig = jnp.einsum("bij,bnj->bni", R, pc) + t[:, None]
    codes_rig = model.encode(params, pc_rig)
    t_expected = jnp.einsum("bij,bnj->bni", R, codes["t"]) + t[:, None]
    np.testing.assert_allclose(
        np.asarray(codes_rig["t"]), np.asarray(t_expected), atol=1e-7
    )


def test_decode_sdf_transforms_with_codes(model_params_pc):
    """SDF field is attached to the codes' frame: querying transformed
    points against transported codes gives identical values."""
    model, params, pc = model_params_pc
    codes = model.encode(params, pc)
    query = jnp.asarray(np.random.default_rng(1).normal(size=(2, 50, 3)))
    sdf = model.decode_sdf(params, query, codes)
    assert sdf.shape == (2, 50)

    R = jnp.asarray(Rotation.random(2, random_state=9).as_matrix())
    t = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3)))
    g = jnp.concatenate([R, t[..., None]], axis=-1)
    codes_t = transform_codes(codes, g)
    query_t = jnp.einsum("bij,bnj->bni", R, query) + t[:, None]
    sdf_t = model.decode_sdf(params, query_t, codes_t)
    np.testing.assert_allclose(np.asarray(sdf_t), np.asarray(sdf), atol=1e-8)


def test_occupancy_logits_sign(model_params_pc):
    model, params, pc = model_params_pc
    codes = model.encode(params, pc)
    q = jnp.zeros((2, 4, 3))
    sdf = model.decode_sdf(params, q, codes)
    occ = model.occupancy_logits(params, q, codes)
    np.testing.assert_allclose(np.asarray(occ), -np.asarray(sdf), atol=1e-12)


def test_encode_fps_masked(model_params_pc):
    model, params, _ = model_params_pc
    rng = np.random.default_rng(4)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)))
    mask = jnp.ones((2, 128), bool).at[:, 100:].set(False)
    codes = model.encode_fps(params, pc, mask)
    assert codes["z_inv"].shape == (2, 32)
    assert bool(jnp.all(jnp.isfinite(codes["z_inv"])))


def test_slice_and_concat_codes(model_params_pc):
    model, params, pc = model_params_pc
    codes = model.encode(params, pc)
    c0 = slice_codes(codes, 0)
    c1 = slice_codes(codes, 1)
    back = concat_codes([c0, c1])
    for k in codes:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(codes[k]))


def test_scale0_top5_normalization(model_params_pc):
    model, _, _ = model_params_pc
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(1, 32, 3)))
    normalized, centroid, scale0 = model.normalize_input(pc)
    centered = np.asarray(pc) - np.asarray(centroid)[:, None]
    d = np.linalg.norm(
        centered[:, :, None] - centered[:, None], axis=-1
    ).reshape(1, -1)
    expected = np.sort(d, axis=-1)[:, -5:].mean(-1)
    np.testing.assert_allclose(np.asarray(scale0), expected, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(normalized), centered / expected[:, None, None], rtol=1e-9
    )


def test_encode_fps_multi_restart(model_params_pc):
    """n_fps > 1 averages codes over random-start FPS restarts
    (model_utils.py:199-215)."""
    model, params, _ = model_params_pc
    rng = np.random.default_rng(9)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)))
    mask = jnp.ones((2, 128), bool).at[:, 96:].set(False)
    c1 = model.encode_fps(params, pc, mask, n_fps=3,
                          rng=jax.random.PRNGKey(1))
    assert c1["z_inv"].shape == (2, 32)
    assert bool(jnp.all(jnp.isfinite(c1["z_inv"])))
    # different rng -> different average (restart starts differ)
    c2 = model.encode_fps(params, pc, mask, n_fps=3,
                          rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(c1["z_inv"]), np.asarray(c2["z_inv"]))
