"""Fused edge conv must be numerically equivalent to the naive
VecLNA-on-materialized-edges path, with identical parameter naming."""
import jax
import jax.numpy as jnp
import numpy as np

from livingscenes_tpu.nn.edge_conv import EdgeVecLNA, GlobalResVecLNA
from livingscenes_tpu.nn.vec_layers import VecLNA

ACT = lambda x: jax.nn.leaky_relu(x, 0.2)


def test_edge_vec_lna_matches_naive(rng):
    B, Ns, Nd, K, C, O = 2, 40, 24, 8, 16, 12
    src = jnp.asarray(rng.normal(size=(B, Ns, C, 3)))
    dst = jnp.asarray(rng.normal(size=(B, Nd, C, 3)))
    idx = jnp.asarray(rng.integers(0, Ns, size=(B, Nd, K)), jnp.int32)

    fused = EdgeVecLNA(C, O, act_func=ACT)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float64),
        fused.init(jax.random.PRNGKey(0), src, dst, idx),
    )
    out_fused = fused.apply(params, src, dst, idx)

    # identical param naming as VecLNA(2C, O)
    naive = VecLNA(2 * C, O, act_func=ACT, mode="so3")
    nn_f = jnp.take_along_axis(src[:, None], idx[..., None, None], axis=2)
    dst_pad = jnp.broadcast_to(dst[:, :, None], nn_f.shape)
    edge = jnp.concatenate([nn_f - dst_pad, dst_pad], axis=-2)
    out_naive = naive.apply(params, edge)

    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_naive), atol=1e-10
    )


def test_global_res_vec_lna_matches_naive(rng):
    B, N, C, O = 2, 30, 16, 16
    f = jnp.asarray(rng.normal(size=(B, N, C, 3)))
    g = jnp.mean(f, axis=1, keepdims=True)

    fused = GlobalResVecLNA(C, O, act_func=ACT)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float64),
        fused.init(jax.random.PRNGKey(0), f, g),
    )
    out_fused = fused.apply(params, f, g)

    naive = VecLNA(2 * C, O, act_func=ACT, mode="so3")
    cat = jnp.concatenate([f, jnp.broadcast_to(g, f.shape)], axis=-2)
    out_naive = naive.apply(params, cat)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_naive), atol=1e-10
    )


def test_fused_edge_kv_matches_naive(rng):
    from livingscenes_tpu.nn.edge_conv import _LNAWeights, fused_edge_kv

    B, Ns, Nd, K, C, O = 2, 30, 18, 6, 12, 10
    src = jnp.asarray(rng.normal(size=(B, Ns, C, 3)))
    dst = jnp.asarray(rng.normal(size=(B, Nd, C, 3)))
    idx = jnp.asarray(rng.integers(0, Ns, size=(B, Nd, K)), jnp.int32)
    nn_f = jnp.take_along_axis(src[:, None], idx[..., None, None], axis=2)

    holder = _LNAWeights(C, O)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float64),
        holder.init(jax.random.PRNGKey(0)),
    )
    W, D = holder.apply(params)
    k_feat, v_feat = fused_edge_kv(nn_f, dst, W, D, W, D, ACT)

    naive = VecLNA(2 * C, O, act_func=ACT, mode="so3")
    dst_pad = jnp.broadcast_to(dst[:, :, None], nn_f.shape)
    edge = jnp.concatenate([nn_f - dst_pad, dst_pad], axis=-2)
    out_naive = naive.apply(params, edge)
    np.testing.assert_allclose(np.asarray(k_feat), np.asarray(out_naive), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_feat), np.asarray(out_naive), atol=1e-10)


def test_encoder_fused_kv_matches_unfused(rng):
    from livingscenes_tpu.nn.vec_dgcnn_attn import VecDGCNNAttn

    kw = dict(
        c_dim=16, num_layers=3, feat_dim=(8, 16, 16), down_sample_layers=(2,),
        down_sample_factor=(2,), atten_start_layer=1, atten_multi_head_c=8,
        num_knn=6, scale_factor=5.0, center_pred=False, approx_knn=False,
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 3)))
    e1 = VecDGCNNAttn(**kw, fused_kv=True)
    e2 = VecDGCNNAttn(**kw, fused_kv=False)
    params = jax.tree.map(
        lambda a: a.astype(jnp.float64), e1.init(jax.random.PRNGKey(0), x)
    )
    # identical param trees -> both variants accept the same params
    o1 = e1.apply(params, x)
    o2 = e2.apply(params, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)
