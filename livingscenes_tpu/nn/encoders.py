"""Alternative encoder family (ablation baselines).

TPU re-designs of the reference's encoder zoo beyond the production
attention encoder (nn/vec_dgcnn_attn.py):

* `VecDGCNN`   — 4-layer VN-DGCNN with concat skip (vec_dgcnn.py:23-118).
* `VecDGCNNV2` — N-layer VN-DGCNN with optional global residual conv
                 (vec_dgcnn.py:121-312 behavior, same heads).
* `DGCNN`      — plain (non-equivariant) DGCNN baseline (dgcnn.py:37-96):
                 returns a constant z_so3 frame like the reference's
                 fake-ones output.
* `PointNet`   — SAL-style PointNet baseline (pointnet.py:8-71).

All share the head contract (scale, z_so3 (B,C,3), z_inv (B,C)) so they
drop into ShapePrior/SIM3Recon interchangeably.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.knn import knn
from .vec_layers import VecLNA, VecLinear, channel_equi_vec_normalize

Array = jax.Array


def _leaky(slope=0.2):
    return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)


def _graph_feature(f: Array, k: int, idx=None):
    """Edge features [nn - x, x] on the feature-space kNN graph.

    f: (B, N, C, 3) -> (B, N, K, 2C, 3); optionally reuse an idx (B, N, K).
    """
    B, N, C, _ = f.shape
    if idx is None:
        flat = f.reshape(B, N, C * 3)
        _, idx = knn(flat, flat, min(k, N))
    nn_f = jnp.take_along_axis(f[:, None], idx[..., None, None], axis=2)
    center = jnp.broadcast_to(f[:, :, None], nn_f.shape)
    return jnp.concatenate([nn_f - center, center], axis=-2), idx


class _InvariantHeads(nn.Module):
    """Shared output heads (vec_dgcnn.py:108-118)."""

    c_dim: int

    @nn.compact
    def __call__(self, feat: Array, scale_factor: float):
        z_so3 = channel_equi_vec_normalize(feat)
        scale = jnp.mean(jnp.linalg.norm(feat, axis=-1), axis=-1) * scale_factor
        dual = VecLinear(self.c_dim, self.c_dim, mode="so3", name="fc_inv")(feat)
        z_inv = jnp.sum(channel_equi_vec_normalize(dual) * z_so3, axis=-1)
        return scale, z_so3, z_inv


class VecDGCNN(nn.Module):
    hidden_dim: int = 128
    c_dim: int = 128
    first_layer_knn: int = 16
    scale_factor: float = 640.0
    leak_neg_slope: float = 0.2
    use_dg: bool = False

    @nn.compact
    def __call__(self, x: Array):
        act = _leaky(self.leak_neg_slope)
        f = x[:, :, None, :]  # (B, N, 1, 3)
        feats = []
        idx = None
        for i, c_in in enumerate(
            [1] + [self.hidden_dim] * 3
        ):
            edge, new_idx = _graph_feature(f, self.first_layer_knn, idx)
            if not self.use_dg and idx is None:
                idx = new_idx  # reuse layer-0 topology
            f = VecLNA(
                c_in * 2, self.hidden_dim, act_func=act, mode="so3",
                name=f"conv{i + 1}",
            )(edge)
            f = jnp.mean(f, axis=2)  # mean pool over K
            feats.append(f)
        cat = jnp.concatenate(feats, axis=-2)
        feat = VecLNA(
            self.hidden_dim * 4, self.c_dim, act_func=act, mode="so3",
            shared_nonlinearity=True, name="conv_c",
        )(cat)
        feat = jnp.mean(feat, axis=1)
        return _InvariantHeads(self.c_dim, name="heads")(feat, self.scale_factor)


class VecDGCNNV2(nn.Module):
    c_dim: int = 256
    num_layers: int = 5
    feat_dim: Sequence[int] = (32, 64, 128, 256, 256)
    num_knn: int = 16
    scale_factor: float = 640.0
    leak_neg_slope: float = 0.2
    use_dg: bool = True
    use_res_global_conv: bool = True

    @nn.compact
    def __call__(self, x: Array):
        act = _leaky(self.leak_neg_slope)
        f = x[:, :, None, :]
        idx = None
        for i in range(self.num_layers):
            c_in = 1 if i == 0 else self.feat_dim[i - 1]
            edge, new_idx = _graph_feature(f, self.num_knn, idx)
            if not self.use_dg and idx is None:
                idx = new_idx
            f = VecLNA(
                c_in * 2, self.feat_dim[i], act_func=act, mode="so3",
                name=f"conv{i}",
            )(edge)
            f = jnp.mean(f, axis=2)
            if self.use_res_global_conv:
                g = jnp.mean(f, axis=1, keepdims=True)
                cat = jnp.concatenate(
                    [f, jnp.broadcast_to(g, f.shape)], axis=-2
                )
                f = VecLNA(
                    self.feat_dim[i] * 2, self.feat_dim[i], act_func=act,
                    mode="so3", name=f"global_conv{i}",
                )(cat)
        feat = VecLNA(
            self.feat_dim[-1], self.c_dim, act_func=act, mode="so3",
            shared_nonlinearity=True, name="conv_c",
        )(f)
        feat = jnp.mean(feat, axis=1)
        return _InvariantHeads(self.c_dim, name="heads")(feat, self.scale_factor)


class DGCNN(nn.Module):
    """Non-equivariant DGCNN ablation (dgcnn.py:37-96); z_so3 is a constant
    frame so downstream code paths still run."""

    c_dim: int = 256
    hidden_dim: int = 128
    num_knn: int = 16

    @nn.compact
    def __call__(self, x: Array):
        B, N, _ = x.shape
        h = x
        feats = []
        for i, c_out in enumerate(
            [self.hidden_dim, self.hidden_dim, self.hidden_dim * 2]
        ):
            _, idx = knn(h, h, min(self.num_knn, N))
            nn_f = jnp.take_along_axis(h[:, None], idx[..., None], axis=2)
            center = jnp.broadcast_to(h[:, :, None], nn_f.shape)
            edge = jnp.concatenate([nn_f - center, center], axis=-1)
            h = nn.Dense(c_out, name=f"conv{i}")(edge)
            h = jax.nn.leaky_relu(h, 0.2)
            h = jnp.max(h, axis=2)
            feats.append(h)
        h = nn.Dense(self.c_dim, name="conv_c")(
            jnp.concatenate(feats, axis=-1)
        )
        z_inv = jnp.max(h, axis=1)
        z_so3 = jnp.broadcast_to(
            jnp.ones((self.c_dim, 3), x.dtype) / jnp.sqrt(3.0),
            (B, self.c_dim, 3),
        )
        scale = jnp.ones((B,), x.dtype)
        return scale, z_so3, z_inv


class PCNet(nn.Module):
    """PCN-style global feature encoder baseline (pcnet.py:9-64): two
    point-MLP stages with a global-max bottleneck, tanh projection,
    center/scale heads, constant z_so3 frame. LayerNorm replaces the
    reference's BatchNorm (jit-pure; batch statistics would couple samples
    at inference)."""

    latent_dim: int = 1024
    output_dim: int = 256

    @nn.compact
    def __call__(self, x: Array):
        B, N, _ = x.shape
        h = nn.Dense(128, name="fc0")(x)
        h = jax.nn.relu(nn.LayerNorm(name="ln0")(h))
        h = nn.Dense(256, name="fc1")(h)
        g = jnp.max(h, axis=1, keepdims=True)
        h = jnp.concatenate([jnp.broadcast_to(g, h.shape), h], axis=-1)
        h = nn.Dense(512, name="fc2")(h)
        h = jax.nn.relu(nn.LayerNorm(name="ln1")(h))
        h = nn.Dense(self.latent_dim, name="fc3")(h)
        feat = jnp.max(h, axis=1)
        feat = jnp.tanh(
            nn.LayerNorm(name="ln2")(nn.Dense(self.output_dim, name="mlp")(feat))
        )
        center = nn.Dense(3, name="head_centroid")(feat)[:, None, :]
        scale = nn.Dense(1, name="head_scale")(feat)[:, 0]
        z_so3 = jnp.broadcast_to(
            jnp.ones((self.output_dim, 3), x.dtype), (B, self.output_dim, 3)
        )
        return center, scale, z_so3, feat


class PointNet(nn.Module):
    """SAL-style PointNet ablation (pointnet.py:8-71)."""

    c_dim: int = 256
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x: Array):
        B, N, _ = x.shape
        h = nn.Dense(self.hidden_dim, name="fc0")(x)
        for i in range(4):
            g = jnp.max(h, axis=1, keepdims=True)
            h = jnp.concatenate([h, jnp.broadcast_to(g, h.shape)], axis=-1)
            h = nn.Dense(self.hidden_dim, name=f"fc{i + 1}")(h)
            h = jax.nn.relu(h)
        z_inv = nn.Dense(self.c_dim, name="fc_out")(jnp.max(h, axis=1))
        z_so3 = jnp.broadcast_to(
            jnp.ones((self.c_dim, 3), x.dtype) / jnp.sqrt(3.0),
            (B, self.c_dim, 3),
        )
        scale = jnp.ones((B,), x.dtype)
        return scale, z_so3, z_inv
