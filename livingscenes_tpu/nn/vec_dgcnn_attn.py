"""SIM(3)-equivariant VN-DGCNN encoder with vector attention.

TPU-native re-design of the reference production encoder `VecDGCNN_att`
(lib_shape_prior/core/lib/vec_sim3/vec_dgcnn_atten.py:22-252):

* Feature layout is (B, N, C, 3) — point axis leading, channel x 3 block
  last, so channel mixing is MXU-friendly and kNN gathers are contiguous.
* kNN graph build is a batched matmul distance + top_k (ops/knn.py),
  replacing pytorch3d.knn_points; FPS downsampling is a fixed-iteration
  lax loop (ops/fps.py), replacing pytorch3d.sample_farthest_points.
* All loops over layers are unrolled at trace time (static layer count);
  there is no data-dependent control flow, so the whole encoder jits to a
  single XLA program.

Outputs (matching vec_dgcnn_atten.py:231-252):
  center (B, 1, 3)   — if center_pred (SO(3)-equivariant center estimate)
  scale (B,)         — channel-norm mean x scale_factor (scales with input)
  z_so3 (B, C, 3)    — rotation-equivariant, scale-invariant feature frame
  z_inv (B, C)       — SIM(3)-invariant embedding
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fps import farthest_point_sampling
from ..ops.pallas_fps import fps_auto
from ..ops.knn import gather_neighbors_onehot, knn
from .edge_conv import _LNAWeights, fused_edge_kv
from .pallas_attention import fused_edge_attention, fused_edge_mean
from .vec_layers import VecLNA, VecLinear, VecResBlock, channel_equi_vec_normalize

Array = jax.Array


def _leaky_relu(slope: float):
    return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)


class VecDGCNNAttn(nn.Module):
    """Production encoder; config mirrors configs/3rscan/dgcnn_attn_inner.yaml:29-44."""

    c_dim: int = 256
    num_layers: int = 7
    feat_dim: Sequence[int] = (32, 32, 64, 64, 128, 256, 512)
    down_sample_layers: Sequence[int] = (2, 4, 5)
    down_sample_factor: Sequence[int] = (2, 4, 4)
    atten_start_layer: int = 2
    atten_multi_head_c: int = 16
    use_res_global_conv: bool = True
    res_global_start_layer: int = 2
    num_knn: int = 16
    scale_factor: float = 64000.0
    leak_neg_slope: float = 0.2
    use_dg: bool = True  # kNN in feature space each layer (dynamic graph)
    center_pred: bool = True
    center_pred_scale: bool = True
    # approx_min_k-based graph build (recall ~0.99, ~3x faster top-k on
    # TPU); neighbor aggregation is order-invariant so the graph tolerates
    # the approximation. Set False for bit-exact parity runs.
    approx_knn: bool = True
    # bf16 matmuls (f32 accumulate) in the per-edge convolutions — the
    # FLOP/traffic-dominant layers; heads and conv_c stay f32.
    mixed_precision: bool = False
    # Compute the attention layers' K/V edge convs via the fused split-
    # linear path (nn/edge_conv.fused_edge_kv): skips the (B,N,K,2C,3)
    # concat and halves passes over the gathered tensor. Numerically
    # equivalent (float reassociation only); same parameter tree.
    fused_kv: bool = True
    # Route neighbor gathers through a one-hot matmul (MXU) instead of
    # XLA's slow TPU gather (~3.5x, f32-rounding-exact). Set False for
    # bit-exact gathers.
    matmul_gather: bool = True
    # VMEM-resident Pallas FPS kernel on TPU (up to 1.9x the XLA loop,
    # exact index match; XLA fallback on other backends).
    pallas_fps: bool = True
    # Project z_so3 through fc_O and SVD-orthogonalize into an O(3) frame
    # matrix (vec_dgcnn_atten.py:115-117,240-244).
    z_so3_as_Omtx: bool = False
    # Fully-fused Pallas attention layer (gather + K/V edge conv +
    # activation + attention + K-reduce in one VMEM-resident kernel,
    # nn/pallas_attention.py). Differentiable: custom VJP with a fused
    # backward kernel, so training uses it too. XLA path off-TPU.
    pallas_attention: bool = False
    # VMEM-resident exact kNN graphs (ops/pallas_knn.py). Safe under
    # differentiation (graph indices carry no gradient; inputs are
    # stop_gradient-ed), so this also speeds the training forward pass.
    # TPU only; XLA path elsewhere.
    pallas_knn: bool = True

    def _knn_idx(
        self,
        src_f: Array,
        dst_f: Array,
        k: int,
        src_xyz: Array,
        dst_xyz: Array,
    ) -> Array:
        """kNN graph indices (B, N_dst, K): feature-space when use_dg
        (vec_dgcnn_atten.py:137-142), else xyz-space."""
        B, N_src, C, _ = src_f.shape
        N_dst = dst_f.shape[1]
        if self.use_dg:
            q = dst_f.reshape(B, N_dst, C * 3)
            p = src_f.reshape(B, N_src, C * 3)
        else:
            q = dst_xyz.reshape(B, N_dst, -1)
            p = src_xyz.reshape(B, N_src, -1)
        if self.pallas_knn and jax.devices()[0].platform == "tpu":
            # VMEM-resident EXACT kNN (ops/pallas_knn.py) — never
            # materializes the (Nq, Np) distance matrix in HBM; measured
            # far faster than both top_k and approx_min_k at graph sizes.
            # Indices are not differentiated through (same as the top_k
            # path); stop_gradient keeps the kernel off the backward pass.
            from ..ops.pallas_knn import knn_pallas

            _, idx = knn_pallas(
                jax.lax.stop_gradient(q),
                jax.lax.stop_gradient(p),
                min(k, N_src),
            )
            return idx
        _, idx = knn(q, p, min(k, N_src), approx=self.approx_knn)
        return idx

    def _layer0_edge(self, src_f: Array, dst_f: Array, idx: Array) -> Array:
        """Layer-0 edge features with the cross-product branch
        (vec_dgcnn_atten.py:154-160): [cross(dst_dir, nn), nn - dst, dst].
        C = 1 here, so materializing is cheap."""
        nn_f = jnp.take_along_axis(
            src_f[:, None], idx[..., None, None], axis=2
        )  # (B, N, K, 1, 3)
        dst_pad = jnp.broadcast_to(dst_f[:, :, None], nn_f.shape)
        dst_dir = dst_f / jnp.maximum(
            jnp.linalg.norm(dst_f, axis=-1, keepdims=True), 1e-12
        )
        crossed = jnp.cross(
            jnp.broadcast_to(dst_dir[:, :, None], nn_f.shape), nn_f
        )
        return jnp.concatenate([crossed, nn_f - dst_pad, dst_pad], axis=-2)

    @nn.compact
    def __call__(self, x: Array, first_knn_idx: Array | None = None):
        """x: (B, N, 3) centered (and pre-scaled) point cloud.

        first_knn_idx: optional precomputed (B, N, K) layer-0 graph. The
        inference front end computes it fused with the top-5 scale
        statistic (ops/pallas_knn.knn_with_topk_scale) — neighbor order
        on the pre-scale cloud is identical (positive-scalar division
        preserves argsort) — so layer 0 skips its own kNN build."""
        B, N, _ = x.shape
        act = _leaky_relu(self.leak_neg_slope)
        ds_layers = list(self.down_sample_layers)
        ds_factors = list(self.down_sample_factor)

        src_xyz = x  # (B, N, 3)
        src_f = x[:, :, None, :]  # (B, N, 1, 3)

        dst_f = src_f
        for i in range(self.num_layers):
            c_in = 1 if i == 0 else self.feat_dim[i - 1]
            c_out = self.feat_dim[i]

            if i in ds_layers:
                factor = ds_factors[ds_layers.index(i)]
                n_new = src_xyz.shape[1] // factor
                if self.pallas_fps:
                    dst_xyz, idx = fps_auto(src_xyz, n_new)
                else:
                    dst_xyz, idx = farthest_point_sampling(src_xyz, n_new)
                dst_f = jnp.take_along_axis(
                    src_f, idx[..., None, None], axis=1
                )
            else:
                dst_xyz, dst_f = src_xyz, src_f

            if i == 0 and first_knn_idx is not None:
                idx = first_knn_idx
            else:
                idx = self._knn_idx(
                    src_f, dst_f, self.num_knn, src_xyz, dst_xyz
                )  # (B, N_dst, K)

            on_tpu = jax.devices()[0].platform == "tpu"
            use_pallas_attn = self.pallas_attention and i >= 1 and on_tpu
            use_pallas_l0 = self.pallas_attention and i == 0 and on_tpu
            # One gather of the raw source features per layer. (A fused
            # gather-after-matmul variant was measured slower on v5e:
            # XLA's 5-D gathers, not the matmuls, dominate, and that form
            # needs 2-4 gathers per layer.)
            nn_f = None
            if i == 0 and not use_pallas_l0:
                edge = self._layer0_edge(src_f, dst_f, idx)
            elif i == 0 or use_pallas_attn:
                pass  # the Pallas kernel gathers in VMEM
            else:
                if self.matmul_gather:
                    Bc, Nsrc, Cc, _ = src_f.shape
                    nn_f = gather_neighbors_onehot(
                        src_f.reshape(Bc, Nsrc, Cc * 3), idx
                    ).reshape(Bc, idx.shape[1], idx.shape[2], Cc, 3)
                else:
                    nn_f = jnp.take_along_axis(
                        src_f[:, None], idx[..., None, None], axis=2
                    )
                if not (self.fused_kv and i >= self.atten_start_layer):
                    dst_pad = jnp.broadcast_to(dst_f[:, :, None], nn_f.shape)
                    edge = jnp.concatenate(
                        [nn_f - dst_pad, dst_pad], axis=-2
                    )
            e_in = c_in * (3 if i == 0 else 2)

            if use_pallas_l0:
                from .edge_conv import _LNAWeightsE
                from .pallas_layer0 import fused_layer0_edge_mean

                W0, D0 = _LNAWeightsE(3, c_out, name=f"V_{i}")()
                dst_f = fused_layer0_edge_mean(
                    src_xyz, idx, W0, D0, neg_slope=self.leak_neg_slope
                )
            elif i < self.atten_start_layer and use_pallas_attn:
                W_V, D_V = _LNAWeights(c_in, c_out, name=f"V_{i}")()
                dst_f = fused_edge_mean(
                    src_f, dst_f, idx, W_V, D_V,
                    neg_slope=self.leak_neg_slope,
                )
            elif i < self.atten_start_layer:
                msg = VecLNA(
                    e_in, c_out, act_func=act, mode="so3", name=f"V_{i}",
                    mm_bf16=self.mixed_precision,
                )(edge)
                dst_f = jnp.mean(msg, axis=2)  # mean over K
            elif use_pallas_attn:
                W_K, D_K = _LNAWeights(c_in, c_out, name=f"K_{i}")()
                W_V, D_V = _LNAWeights(c_in, c_out, name=f"V_{i}")()
                q_feat = VecLNA(
                    c_in, c_out, act_func=act, mode="so3", name=f"Q_{i}"
                )(dst_f)
                dst_f = fused_edge_attention(
                    src_f,
                    dst_f,
                    idx,
                    channel_equi_vec_normalize(q_feat),
                    W_K,
                    D_K,
                    W_V,
                    D_V,
                    head_c=self.atten_multi_head_c,
                    neg_slope=self.leak_neg_slope,
                )
            else:
                if self.fused_kv:
                    W_K, D_K = _LNAWeights(c_in, c_out, name=f"K_{i}")()
                    W_V, D_V = _LNAWeights(c_in, c_out, name=f"V_{i}")()
                    k_feat, v_feat = fused_edge_kv(
                        nn_f, dst_f, W_K, D_K, W_V, D_V, act
                    )
                else:
                    k_feat = VecLNA(
                        e_in, c_out, act_func=act, mode="so3", name=f"K_{i}",
                        mm_bf16=self.mixed_precision,
                    )(edge)
                    v_feat = VecLNA(
                        e_in, c_out, act_func=act, mode="so3", name=f"V_{i}",
                        mm_bf16=self.mixed_precision,
                    )(edge)
                q_feat = VecLNA(
                    c_in, c_out, act_func=act, mode="so3", name=f"Q_{i}"
                )(dst_f)
                k_n = channel_equi_vec_normalize(k_feat)  # (B, Nd, K, C, 3)
                q_n = channel_equi_vec_normalize(q_feat)  # (B, Nd, C, 3)
                qk = jnp.einsum("bnkci,bnci->bnkc", k_n, q_n)
                n_head = c_out // self.atten_multi_head_c
                qk_h = qk.reshape(
                    B, qk.shape[1], qk.shape[2], n_head, self.atten_multi_head_c
                )
                attn = jnp.sum(qk_h, axis=-1, keepdims=True) / jnp.sqrt(
                    jnp.asarray(3 * self.atten_multi_head_c, x.dtype)
                )
                attn = jax.nn.softmax(attn, axis=2)  # over K
                attn = jnp.broadcast_to(attn, qk_h.shape).reshape(qk.shape)
                dst_f = jnp.einsum("bnkc,bnkci->bnci", attn, v_feat)

            if self.use_res_global_conv and i >= self.res_global_start_layer:
                g = jnp.mean(dst_f, axis=1, keepdims=True)  # (B, 1, C, 3)
                cat = jnp.concatenate(
                    [dst_f, jnp.broadcast_to(g, dst_f.shape)], axis=-2
                )
                dst_f = VecLNA(
                    c_out * 2, c_out, act_func=act, mode="so3",
                    name=f"global_conv_{i}",
                )(cat)

            src_xyz, src_f = dst_xyz, dst_f

        feat = VecLNA(
            self.feat_dim[-1],
            self.c_dim,
            act_func=act,
            mode="so3",
            shared_nonlinearity=True,
            name="conv_c",
        )(dst_f)
        feat = jnp.mean(feat, axis=1)  # (B, C, 3)

        z_so3 = channel_equi_vec_normalize(feat)
        scale = jnp.mean(jnp.linalg.norm(feat, axis=-1), axis=-1) * self.scale_factor
        z_inv_dual = VecLinear(self.c_dim, self.c_dim, mode="so3", name="fc_inv")(
            feat
        )
        z_inv = jnp.sum(channel_equi_vec_normalize(z_inv_dual) * z_so3, axis=-1)

        if self.z_so3_as_Omtx:
            # O(3)-frame head (vec_dgcnn_atten.py:240-244): project the
            # normalized frame to 3 basis vectors and snap to the nearest
            # orthogonal matrix via an f64 SVD (matching the reference's
            # .double() round-trip).
            basis = VecLinear(self.c_dim, 3, mode="so3", name="fc_O")(z_so3)
            R_pred = jnp.swapaxes(basis, -1, -2)  # (B, 3, num_basis)
            U, _, Vh = jnp.linalg.svd(R_pred.astype(jnp.float64))
            z_so3 = jnp.swapaxes(U @ Vh, -1, -2).astype(R_pred.dtype)

        if self.center_pred:
            center = VecResBlock(
                self.c_dim,
                1,
                self.c_dim // 2,
                act_func=act,
                mode="so3",
                name="fc_center",
            )(feat)  # (B, 1, 3)
            if self.center_pred_scale:
                center = center * self.scale_factor
            return center, scale, z_so3, z_inv
        return scale, z_so3, z_inv
