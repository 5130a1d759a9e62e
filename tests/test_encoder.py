"""Encoder-level equivariance tests (reference self-test at
vec_dgcnn_atten.py:255-320, turned into assertions):
  scale(s.R.x) = s * scale(x)
  z_so3(s.R.x) = z_so3(x) @ R^T   (rows rotate)
  z_inv(s.R.x) = z_inv(x)
  center(s.R.x) = s.R.center(x)
Uses a small config (fewer layers/channels/points) for test speed — the
properties are architecture-wide, not size-dependent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu.nn.vec_dgcnn_attn import VecDGCNNAttn

B, N = 2, 64

SMALL = dict(
    c_dim=32,
    num_layers=4,
    feat_dim=(16, 16, 32, 32),
    down_sample_layers=(2,),
    down_sample_factor=(2,),
    atten_start_layer=2,
    atten_multi_head_c=8,
    num_knn=8,
    scale_factor=10.0,
)


def f64(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float64), tree)


@pytest.fixture(scope="module")
def encoder_and_params():
    enc = VecDGCNNAttn(**SMALL, center_pred=True, center_pred_scale=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, 3)))
    params = f64(enc.init(jax.random.PRNGKey(0), x))
    return enc, params, x


def test_output_shapes(encoder_and_params):
    enc, params, x = encoder_and_params
    center, scale, z_so3, z_inv = enc.apply(params, x)
    assert center.shape == (B, 1, 3)
    assert scale.shape == (B,)
    assert z_so3.shape == (B, SMALL["c_dim"], 3)
    assert z_inv.shape == (B, SMALL["c_dim"],)


def test_sim3_equivariance(encoder_and_params):
    enc, params, x = encoder_and_params
    rng = np.random.default_rng(11)
    center, scale, z_so3, z_inv = enc.apply(params, x)

    for trial in range(3):
        R = jnp.asarray(
            Rotation.random(B, random_state=100 + trial).as_matrix()
        )
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(B,)))
        x_aug = jnp.einsum("bij,bnj->bni", R, x * s[:, None, None])
        c_hat, scale_hat, z_so3_hat, z_inv_hat = enc.apply(params, x_aug)

        np.testing.assert_allclose(
            np.asarray(scale_hat), np.asarray(scale * s), rtol=1e-9
        )
        z_so3_rot = jnp.einsum("bij,bcj->bci", R, z_so3)
        np.testing.assert_allclose(
            np.asarray(z_so3_hat), np.asarray(z_so3_rot), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(z_inv_hat), np.asarray(z_inv), atol=1e-9
        )
        c_rot = jnp.einsum("bij,bnj->bni", R, center * s[:, None, None])
        np.testing.assert_allclose(
            np.asarray(c_hat), np.asarray(c_rot), atol=1e-8
        )


def test_z_so3_scale_invariant(encoder_and_params):
    enc, params, x = encoder_and_params
    _, _, z_so3, _ = enc.apply(params, x)
    _, _, z_so3_scaled, _ = enc.apply(params, x * 3.7)
    np.testing.assert_allclose(
        np.asarray(z_so3_scaled), np.asarray(z_so3), atol=1e-9
    )


def test_jit_compiles(encoder_and_params):
    enc, params, x = encoder_and_params
    out1 = enc.apply(params, x)
    out2 = jax.jit(enc.apply)(params, x)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_no_center_pred_returns_three():
    enc = VecDGCNNAttn(**SMALL, center_pred=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 3)))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert len(out) == 3


def test_fc_O_head_orthogonal_and_equivariant():
    """z_so3_as_Omtx head (vec_dgcnn_atten.py:240-244): output is a (B,3,3)
    orthogonal frame that rotates with the input."""
    enc = VecDGCNNAttn(**SMALL, center_pred=False, z_so3_as_Omtx=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, N, 3)))
    params = f64(enc.init(jax.random.PRNGKey(2), x))
    _, z_so3, _ = enc.apply(params, x)
    assert z_so3.shape == (B, 3, 3)
    # Orthogonality: rows form an orthonormal basis (O(3) snap via SVD).
    should_be_eye = jnp.einsum("bij,bkj->bik", z_so3, z_so3)
    np.testing.assert_allclose(
        np.asarray(should_be_eye), np.broadcast_to(np.eye(3), (B, 3, 3)),
        atol=1e-9,
    )
    # Equivariance: frame rotates with the input.
    R = jnp.asarray(Rotation.random(B, random_state=5).as_matrix())
    x_rot = jnp.einsum("bij,bnj->bni", R, x)
    _, z_rot, _ = enc.apply(params, x_rot)
    expected = jnp.einsum("bij,bcj->bci", R, z_so3)
    np.testing.assert_allclose(
        np.asarray(z_rot), np.asarray(expected), atol=1e-8
    )
