"""Fused VN edge convolution.

The naive DGCNN edge conv materializes (B, N, K, 2C, 3) edge tensors —
each source feature duplicated K=16 times — and runs the channel-mixing
matmul on the duplicated rows. Because the edge feature is linear in its
two halves,

    W @ [nn - dst, dst] = W_l @ nn + (W_r - W_l) @ dst,

and `nn` is a gather of the source features, the expensive matmul commutes
with the gather:

    conv(edge)[b, n, k] = gather(W_l @ src)[b, idx[n, k]]
                          + ((W_r - W_l) @ dst)[b, n].

This runs the channel mixing on the UN-gathered source (K x fewer rows and
K x less HBM traffic), materializing only the (B, N, K, C_out, 3) output
needed by the nonlinear VecActivation. Parameter naming matches VecLNA
("lin/weight", "act/..."), so checkpoints convert identically
(models/convert.py) and the computation is bit-equivalent to the naive
path (tests/test_edge_conv.py).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vec_layers import VecActivation

Array = jax.Array


class _Weight(nn.Module):
    """Bare weight holder so the param path matches VecLinear's
    ("<name>/weight")."""

    rows: int
    cols: int
    v_in_for_init: int

    @nn.compact
    def __call__(self):
        def init(key, shape, dtype=jnp.float32):
            bound = jnp.sqrt(1.0 / shape[1])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return self.param("weight", init, (self.rows, self.cols))


class _ActScope(nn.Module):
    """Holder producing the VecActivation lin_dir weight under the scope
    "act/lin_dir/weight" (so checkpoints map 1:1 to the naive VecLNA)."""

    c_out: int

    @nn.compact
    def __call__(self):
        return _Weight(self.c_out, self.c_out, self.c_out, name="lin_dir")()


class EdgeVecLNA(nn.Module):
    """VecLNA specialized to [nn - dst, dst] edge features (so3 mode).

    Drop-in replacement for `VecLNA(2*c_in, c_out)(edge)` in the encoder's
    message-passing layers; takes (src_f, dst_f, idx) instead of the
    materialized edge tensor. Both channel-mixing matmuls (the edge conv
    AND the activation's direction predictor, which is linear too) run on
    the un-gathered per-point features; only elementwise work touches the
    (B, Nd, K, c_out, 3) edge tensor.
    """

    c_in: int
    c_out: int
    act_func: Callable[[Array], Array]

    @nn.compact
    def __call__(self, src_f: Array, dst_f: Array, idx: Array) -> Array:
        """src_f: (B, Ns, C, 3); dst_f: (B, Nd, C, 3); idx: (B, Nd, K).

        Returns (B, Nd, K, c_out, 3).
        """
        W = _Weight(self.c_out, 2 * self.c_in, 2 * self.c_in, name="lin")()
        W_l = W[:, : self.c_in]
        W_r = W[:, self.c_in :]
        D = _ActScope(self.c_out, name="act")()  # direction weight (O, O)

        y_src = jnp.einsum("oc,bnci->bnoi", W_l, src_f)
        y_dst = jnp.einsum("oc,bnci->bnoi", W_r - W_l, dst_f)
        # Direction field is a linear map of the conv output, so it also
        # commutes with the gather: k = gather(D y_src) + D y_dst.
        d_src = jnp.einsum("oc,bnci->bnoi", D, y_src)
        d_dst = jnp.einsum("oc,bnci->bnoi", D, y_dst)

        gidx = idx[..., None, None]
        q = jnp.take_along_axis(y_src[:, None], gidx, axis=2) + y_dst[:, :, None]
        k = jnp.take_along_axis(d_src[:, None], gidx, axis=2) + d_dst[:, :, None]

        # VecActivation body (vec_layers.py:261-265), elementwise per edge.
        k_dir = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12
        )
        q_para = jnp.sum(q * k_dir, axis=-1, keepdims=True)
        return q - q_para * k_dir + k_dir * self.act_func(q_para)


class _LNAWeights(nn.Module):
    """Parameter holder matching VecLNA's tree: lin/weight (c_out, 2c_in)
    and act/lin_dir/weight (c_out, c_out)."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        W = _Weight(self.c_out, 2 * self.c_in, 2 * self.c_in, name="lin")()
        D = _ActScope(self.c_out, name="act")()
        return W, D


class _LNAWeightsE(nn.Module):
    """Like _LNAWeights but with an explicit edge-input channel count
    (layer 0's 3-channel [cross, nn - dst, dst] edge)."""

    e_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        W = _Weight(self.c_out, self.e_in, self.e_in, name="lin")()
        D = _ActScope(self.c_out, name="act")()
        return W, D


def _so3_activation(y: Array, k: Array, act_func) -> Array:
    """VecActivation body (vec_layers.py:261-265) on precomputed q=y, k."""
    k_dir = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    q_para = jnp.sum(y * k_dir, axis=-1, keepdims=True)
    return y - q_para * k_dir + k_dir * act_func(q_para)


def fused_edge_kv(
    nn_f: Array,
    dst_f: Array,
    W_K: Array,
    D_K: Array,
    W_V: Array,
    D_V: Array,
    act_func: Callable[[Array], Array],
):
    """K- and V-branch edge convs of an attention layer in one pass.

    Equivalent to two `VecLNA(2*c_in, c_out)` calls on the materialized
    [nn - dst, dst] edge tensor (the reference's K_list[i]/V_list[i] convs,
    vec_dgcnn_atten.py:206-208), but:

    * the (B, N, K, 2C, 3) edge concat is never materialized — the linear
      splits as W @ [nn - dst, dst] = W_l @ nn + (W_r - W_l) @ dst, where
      the dst half has no K axis,
    * the K and V branch weights stack into ONE (2*c_out, c_in) matmul over
      the gathered neighbor tensor, halving passes over the biggest array.

    nn_f: (B, N, K, C, 3) gathered neighbors; dst_f: (B, N, C, 3);
    W_K/W_V: (c_out, 2*c_in) VecLNA lin weights; D_K/D_V: (c_out, c_out)
    activation direction weights. Returns (k_feat, v_feat).
    """
    c_in = dst_f.shape[-2]
    c_out = W_K.shape[0]
    W_l = jnp.concatenate([W_K[:, :c_in], W_V[:, :c_in]], axis=0)
    W_delta = jnp.concatenate(
        [
            W_K[:, c_in:] - W_K[:, :c_in],
            W_V[:, c_in:] - W_V[:, :c_in],
        ],
        axis=0,
    )
    y = jnp.einsum("oc,bnkci->bnkoi", W_l, nn_f) + jnp.einsum(
        "oc,bnci->bnoi", W_delta, dst_f
    )[:, :, None]
    y_k, y_v = y[..., :c_out, :], y[..., c_out:, :]
    k_feat = _so3_activation(
        y_k, jnp.einsum("oc,bnkci->bnkoi", D_K, y_k), act_func
    )
    v_feat = _so3_activation(
        y_v, jnp.einsum("oc,bnkci->bnkoi", D_V, y_v), act_func
    )
    return k_feat, v_feat


class GlobalResVecLNA(nn.Module):
    """VecLNA specialized to [f, broadcast(global)] inputs.

    Replaces `VecLNA(2C, C)(concat([f, g.broadcast]))` in the encoder's
    global residual conv: the global half of the matmul is computed once
    per instance instead of once per point.
    """

    c_in: int
    c_out: int
    act_func: Callable[[Array], Array]

    @nn.compact
    def __call__(self, f: Array, g: Array) -> Array:
        """f: (B, N, C, 3); g: (B, 1, C, 3) -> (B, N, c_out, 3)."""
        W = _Weight(self.c_out, 2 * self.c_in, 2 * self.c_in, name="lin")()
        W_l = W[:, : self.c_in]
        W_r = W[:, self.c_in :]
        y = jnp.einsum("oc,bnci->bnoi", W_l, f) + jnp.einsum(
            "oc,bnci->bnoi", W_r, g
        )
        act = VecActivation(
            self.c_out, self.act_func, False, mode="so3", name="act"
        )
        return act(y)
