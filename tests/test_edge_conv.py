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
