"""Fused Pallas attention kernel vs the XLA attention path (interpret
mode on CPU — same kernel program the TPU runs, minus Mosaic lowering)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.nn.edge_conv import fused_edge_kv
from livingscenes_tpu.nn.pallas_attention import fused_edge_attention
from livingscenes_tpu.nn.vec_layers import channel_equi_vec_normalize
from livingscenes_tpu.ops.knn import gather_neighbors


def xla_attention(src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V, head_c=16,
                  neg_slope=0.2):
    """The encoder's XLA attention path (nn/vec_dgcnn_attn.py:182-211)."""
    act = lambda x: jax.nn.leaky_relu(x, negative_slope=neg_slope)
    B, Ns, C, _ = src_f.shape
    nn_f = gather_neighbors(
        src_f.reshape(B, Ns, C * 3), idx
    ).reshape(B, idx.shape[1], idx.shape[2], C, 3)
    k_feat, v_feat = fused_edge_kv(nn_f, dst_f, W_K, D_K, W_V, D_V, act)
    k_n = channel_equi_vec_normalize(k_feat)
    qk = jnp.einsum("bnkci,bnci->bnkc", k_n, q_n)
    O = W_K.shape[0]
    n_head = O // head_c
    qk_h = qk.reshape(B, qk.shape[1], qk.shape[2], n_head, head_c)
    attn = jnp.sum(qk_h, axis=-1, keepdims=True) / jnp.sqrt(
        jnp.asarray(3 * head_c, jnp.float32)
    )
    attn = jax.nn.softmax(attn, axis=2)
    attn = jnp.broadcast_to(attn, qk_h.shape).reshape(qk.shape)
    return jnp.einsum("bnkc,bnkci->bnci", attn, v_feat)


@pytest.mark.parametrize(
    "B,Ns,Nd,C,O,K",
    [
        (2, 64, 32, 16, 32, 8),   # small downsampling layer
        (1, 128, 128, 32, 64, 16),  # production L2-like ratios
    ],
)
def test_pallas_matches_xla(B, Ns, Nd, C, O, K):
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    src_f = f32(B, Ns, C, 3)
    dst_f = f32(B, Nd, C, 3)
    q_feat = f32(B, Nd, O, 3)
    q_n = channel_equi_vec_normalize(q_feat)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    W_K, W_V = f32(O, 2 * C) * 0.2, f32(O, 2 * C) * 0.2
    D_K, D_V = f32(O, O) * 0.2, f32(O, O) * 0.2

    ref = xla_attention(src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V)
    out = fused_edge_attention(
        src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V,
        head_c=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_pallas_tile_choice_divides():
    from livingscenes_tpu.nn.pallas_attention import _pick_tile

    # production layer shapes (N_src, N_dst, C, O)
    for n_src, n_dst, c, o in [
        (1024, 512, 32, 64),
        (512, 512, 64, 64),
        (512, 128, 64, 128),
        (128, 32, 128, 256),
        (32, 32, 256, 512),
    ]:
        tn = _pick_tile(n_dst, n_src, c, o, 16)
        assert n_dst % tn == 0 and tn >= 8, (n_src, n_dst, tn)


def test_fused_edge_mean_matches_xla():
    """Mean-pool edge-conv kernel (pre-attention V layers) vs the XLA
    VecLNA path."""
    from livingscenes_tpu.nn.pallas_attention import fused_edge_mean
    from livingscenes_tpu.nn.vec_layers import VecLNA

    rng = np.random.default_rng(1)
    B, Ns, Nd, C, O, K = 2, 64, 32, 16, 32, 8
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    src_f, dst_f = f32(B, Ns, C, 3), f32(B, Nd, C, 3)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    W, D = f32(O, 2 * C) * 0.2, f32(O, O) * 0.2

    # XLA path: materialized edge + VecLNA + mean over K
    nn_f = gather_neighbors(
        src_f.reshape(B, Ns, C * 3), idx
    ).reshape(B, Nd, K, C, 3)
    dst_pad = jnp.broadcast_to(dst_f[:, :, None], nn_f.shape)
    edge = jnp.concatenate([nn_f - dst_pad, dst_pad], axis=-2)
    act = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    lna = VecLNA(2 * C, O, act_func=act, mode="so3")
    params = {
        "params": {
            "lin": {"weight": W},
            "act": {"lin_dir": {"weight": D}},
        }
    }
    ref = jnp.mean(lna.apply(params, edge), axis=2)

    out = fused_edge_mean(src_f, dst_f, idx, W, D, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_pallas_flag_preserves_param_tree_and_cpu_outputs():
    """pallas_attention=True must not change the parameter tree (checkpoint
    compatibility) and must fall back to identical outputs off-TPU."""
    from livingscenes_tpu.nn.vec_dgcnn_attn import VecDGCNNAttn

    kw = dict(
        c_dim=32, num_layers=4, feat_dim=(16, 16, 32, 32),
        down_sample_layers=(2,), down_sample_factor=(2,),
        atten_start_layer=2, atten_multi_head_c=8, num_knn=8,
        scale_factor=10.0, approx_knn=False,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 3)), jnp.float32
    )
    e1 = VecDGCNNAttn(**kw, pallas_attention=False)
    e2 = VecDGCNNAttn(**kw, pallas_attention=True)
    p1 = e1.init(jax.random.PRNGKey(0), x)
    p2 = e2.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(e1.apply(p1, x), e2.apply(p1, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


# ---------------------------------------------------------------------------
# Round 3: custom-VJP backward kernels — gradient equality vs the XLA path
# ---------------------------------------------------------------------------

def test_fused_edge_mean_gradients_match_xla():
    """grad of sum(weighted output) through the Pallas mean-edge kernel
    (hand-written _mean_edge_bwd_kernel) == grad through the XLA path, for
    every differentiable input (src, dst, W, D)."""
    from livingscenes_tpu.nn.pallas_attention import fused_edge_mean
    from livingscenes_tpu.nn.vec_layers import VecLNA

    rng = np.random.default_rng(3)
    B, Ns, Nd, C, O, K = 2, 64, 32, 16, 32, 8
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    src_f, dst_f = f32(B, Ns, C, 3), f32(B, Nd, C, 3)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    W, D = f32(O, 2 * C) * 0.2, f32(O, O) * 0.2
    cot = f32(B, Nd, O, 3)  # random cotangent direction

    act = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    lna = VecLNA(2 * C, O, act_func=act, mode="so3")

    def xla_loss(src_f, dst_f, W, D):
        nn_f = gather_neighbors(
            src_f.reshape(B, Ns, C * 3), idx
        ).reshape(B, Nd, K, C, 3)
        dst_pad = jnp.broadcast_to(dst_f[:, :, None], nn_f.shape)
        edge = jnp.concatenate([nn_f - dst_pad, dst_pad], axis=-2)
        params = {
            "params": {
                "lin": {"weight": W},
                "act": {"lin_dir": {"weight": D}},
            }
        }
        out = jnp.mean(lna.apply(params, edge), axis=2)
        return jnp.sum(out * cot)

    def pallas_loss(src_f, dst_f, W, D):
        out = fused_edge_mean(src_f, dst_f, idx, W, D, interpret=True)
        return jnp.sum(out * cot)

    g_ref = jax.grad(xla_loss, argnums=(0, 1, 2, 3))(src_f, dst_f, W, D)
    g_pal = jax.grad(pallas_loss, argnums=(0, 1, 2, 3))(src_f, dst_f, W, D)
    for name, a, b in zip(("src", "dst", "W", "D"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=name,
        )


def test_fused_edge_attention_gradients_match_xla():
    """grad through the Pallas attention kernel (_attention_bwd_kernel) ==
    grad through the XLA attention path, for src, dst, q_n and all four
    weight matrices."""
    rng = np.random.default_rng(4)
    B, Ns, Nd, C, O, K = 2, 64, 32, 16, 32, 8
    f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    src_f, dst_f = f32(B, Ns, C, 3), f32(B, Nd, C, 3)
    q_feat = f32(B, Nd, O, 3)
    q_n = channel_equi_vec_normalize(q_feat)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    W_K, W_V = f32(O, 2 * C) * 0.2, f32(O, 2 * C) * 0.2
    D_K, D_V = f32(O, O) * 0.2, f32(O, O) * 0.2
    cot = f32(B, Nd, O, 3)

    def xla_loss(src_f, dst_f, q_n, W_K, D_K, W_V, D_V):
        out = xla_attention(
            src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V, head_c=16
        )
        return jnp.sum(out * cot)

    def pallas_loss(src_f, dst_f, q_n, W_K, D_K, W_V, D_V):
        out = fused_edge_attention(
            src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V,
            head_c=16, interpret=True,
        )
        return jnp.sum(out * cot)

    g_ref = jax.grad(xla_loss, argnums=tuple(range(7)))(
        src_f, dst_f, q_n, W_K, D_K, W_V, D_V
    )
    g_pal = jax.grad(pallas_loss, argnums=tuple(range(7)))(
        src_f, dst_f, q_n, W_K, D_K, W_V, D_V
    )
    names = ("src", "dst", "q_n", "W_K", "D_K", "W_V", "D_V")
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=name,
        )


def test_fused_layer0_matches_xla_and_grads():
    """Layer-0 cross-product edge conv kernel (nn/pallas_layer0.py):
    forward equality vs the encoder's XLA _layer0_edge + VecLNA + mean,
    and gradient equality for xyz, W, D."""
    from livingscenes_tpu.nn.pallas_layer0 import fused_layer0_edge_mean
    from livingscenes_tpu.nn.vec_layers import VecLNA

    rng = np.random.default_rng(6)
    B, N, K, O = 2, 64, 8, 32
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.5, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    W = jnp.asarray(rng.normal(size=(O, 3)) * 0.2, jnp.float32)
    D = jnp.asarray(rng.normal(size=(O, O)) * 0.2, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, N, O, 3)), jnp.float32)

    act = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    lna = VecLNA(3, O, act_func=act, mode="so3")
    params = {
        "params": {
            "lin": {"weight": W},
            "act": {"lin_dir": {"weight": D}},
        }
    }

    def xla_l0(xyz, W, D):
        p = {
            "params": {
                "lin": {"weight": W},
                "act": {"lin_dir": {"weight": D}},
            }
        }
        src_f = xyz[:, :, None, :]
        nn_f = jnp.take_along_axis(
            src_f[:, None], idx[..., None, None], axis=2
        )
        dst_pad = jnp.broadcast_to(src_f[:, :, None], nn_f.shape)
        dst_dir = src_f / jnp.maximum(
            jnp.linalg.norm(src_f, axis=-1, keepdims=True), 1e-12
        )
        crossed = jnp.cross(
            jnp.broadcast_to(dst_dir[:, :, None], nn_f.shape), nn_f
        )
        edge = jnp.concatenate([crossed, nn_f - dst_pad, dst_pad], axis=-2)
        return jnp.mean(lna.apply(p, edge), axis=2)

    ref = xla_l0(xyz, W, D)
    out = fused_layer0_edge_mean(xyz, idx, W, D, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )

    g_ref = jax.grad(
        lambda *a: jnp.sum(xla_l0(*a) * cot), argnums=(0, 1, 2)
    )(xyz, W, D)
    g_pal = jax.grad(
        lambda *a: jnp.sum(
            fused_layer0_edge_mean(a[0], idx, a[1], a[2], interpret=True)
            * cot
        ),
        argnums=(0, 1, 2),
    )(xyz, W, D)
    for name, a, b in zip(("xyz", "W", "D"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=name,
        )
