"""Fused Pallas kernel for the VN-DGCNN attention layer.

One attention layer of the production encoder (the reference's QKV message
passing, vec_dgcnn_atten.py:205-219) chains, per edge (dst point x K
neighbors):

  gather -> K/V edge conv -> VecActivation -> channel normalization ->
  q.k similarity -> head-summed softmax over K -> weighted V sum.

XLA materializes several (B, N_dst, K, C_out, 3) intermediates in HBM
between these steps; at production sizes that traffic dominates the layer
(~35 ms/layer on v5e at batch 128, ROUND1_NOTES). This kernel keeps the
whole edge pipeline VMEM-resident: per grid step (one instance x one dst
tile) it gathers neighbors with a one-hot MXU matmul, runs both edge convs
and activations, attention, and the K-reduction, writing only the
(TN, C_out) x 3 output tile.

Mosaic constraints honored (ROUND1_NOTES): no batched dot (the 3 vector
components are unrolled python-side), no per-row dynamic gather (one-hot
matmul), head sum / broadcast via constant 0/1 matmuls instead of lane
reshapes.

Numerics: identical operations to the XLA path up to f32 matmul rounding;
validated in tests/test_pallas_attention.py (interpret mode, CPU).
Forward-only (the encoder's Pallas path is used for inference; training
uses the XLA path, which is differentiable).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attention_kernel(
    src_ref,     # (1, 3, N_src, C)
    ydst_ref,    # (1, 3, TN, 2*O)  = W_delta @ dst (no K axis)
    qn_ref,      # (1, 3, TN, O)    channel-normalized Q features
    idx_ref,     # (1, TN, K) int32
    wl_ref,      # (C, 2*O)         stacked [W_K_l; W_V_l]^T
    dk_ref,      # (O, O)           D_K^T (activation direction, K branch)
    dv_ref,      # (O, O)           D_V^T
    out_ref,     # (1, 3, TN, O)
    *,
    n_src: int,
    c_in: int,
    c_out: int,
    k: int,
    head_c: int,
    neg_slope: float,
):
    TN = idx_ref.shape[1]
    E = TN * k
    O = c_out

    def rep_rows(x):
        """(TN, W) -> (E, W), each row repeated K times. Mosaic-safe: a
        broadcast plus a minor-dim-preserving reshape (lane-dim reshapes
        are unsupported)."""
        W = x.shape[-1]
        return jnp.broadcast_to(x[:, None, :], (TN, k, W)).reshape(E, W)

    # one-hot built in (TN, K, N_src) then flattened (minor dim kept)
    src_iota = jax.lax.broadcasted_iota(jnp.int32, (TN, k, n_src), 2)
    onehot = (
        (src_iota == idx_ref[0][..., None]).astype(jnp.float32)
    ).reshape(E, n_src)

    # ---- gather + edge conv per vector component ----
    wl = wl_ref[:]  # (C, 2O)
    yk, yv = [], []
    for i in range(3):
        nn_i = jnp.dot(
            onehot, src_ref[0, i], preferred_element_type=jnp.float32
        )  # (E, C)
        y_i = jnp.dot(nn_i, wl, preferred_element_type=jnp.float32)
        # add the dst half (broadcast each dst row over its K edges)
        y_i = y_i + rep_rows(ydst_ref[0, i])
        yk.append(y_i[:, :O])
        yv.append(y_i[:, O:])

    def vec_activation(y, d_t):
        """so3 VecActivation (vec_layers.py:261-265) on 3-component lists."""
        kdir = [
            jnp.dot(y[i], d_t, preferred_element_type=jnp.float32)
            for i in range(3)
        ]
        n2 = kdir[0] ** 2 + kdir[1] ** 2 + kdir[2] ** 2
        inv = 1.0 / jnp.maximum(jnp.sqrt(n2), 1e-12)
        kdir = [kd * inv for kd in kdir]
        qpara = y[0] * kdir[0] + y[1] * kdir[1] + y[2] * kdir[2]
        acted = jnp.where(qpara >= 0, qpara, neg_slope * qpara)
        return [
            y[i] - qpara * kdir[i] + kdir[i] * acted for i in range(3)
        ]

    kf = vec_activation(yk, dk_ref[:])
    vf = vec_activation(yv, dv_ref[:])

    # ---- channel_equi_vec_normalize(k) (vec_layers.py:24-31) ----
    knorm = jnp.sqrt(
        jnp.maximum(kf[0] ** 2 + kf[1] ** 2 + kf[2] ** 2, 0.0)
    )  # (E, O)
    cross = jnp.sqrt(
        jnp.sum(knorm * knorm, axis=-1, keepdims=True)
    )  # (E, 1)
    scale = (knorm / jnp.maximum(cross, 1e-12)) / jnp.maximum(knorm, 1e-12)
    # k_n_i = (kf_i / knorm) * (knorm / cross) = kf_i * scale

    # ---- q.k similarity ----
    qk = jnp.zeros((E, O), jnp.float32)
    for i in range(3):
        qn_b = rep_rows(qn_ref[0, i])  # (E, O)
        qk = qk + (kf[i] * scale) * qn_b

    # ---- head sum via 0/1 matmul (no lane reshapes) ----
    n_head = O // head_c
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (O, n_head), 0)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (O, n_head), 1)
    headmat = (lane_o // head_c == lane_h).astype(jnp.float32)  # (O, H)
    logits = jnp.dot(
        qk, headmat, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(3 * head_c))  # (E, H)

    # ---- softmax over K (rows grouped t*K + k) ----
    lg = logits.reshape(TN, k, n_head)
    m = jnp.max(lg, axis=1, keepdims=True)
    ex = jnp.exp(lg - m)
    attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TN, K, H)
    attn_full = jnp.dot(
        attn.reshape(E, n_head), headmat.T,
        preferred_element_type=jnp.float32,
    )  # (E, O)

    # ---- weighted V sum over K ----
    for i in range(3):
        out_ref[0, i] = jnp.sum(
            (attn_full * vf[i]).reshape(TN, k, O), axis=1
        )


def _mean_edge_kernel(
    src_ref,     # (1, 3, N_src, C)
    ydst_ref,    # (1, 3, TN, O)  = (W_r - W_l) @ dst
    idx_ref,     # (1, TN, K) int32
    wl_ref,      # (C, O)  W_l^T
    d_ref,       # (O, O)  D^T (activation direction)
    out_ref,     # (1, 3, TN, O)
    *,
    n_src: int,
    c_out: int,
    k: int,
    neg_slope: float,
):
    """Mean-pool edge-conv layer (the pre-attention V layers,
    vec_dgcnn_atten.py:202-204): gather + VecLNA + mean over K, fused."""
    TN = idx_ref.shape[1]
    E = TN * k
    O = c_out

    src_iota = jax.lax.broadcasted_iota(jnp.int32, (TN, k, n_src), 2)
    onehot = (
        (src_iota == idx_ref[0][..., None]).astype(jnp.float32)
    ).reshape(E, n_src)

    wl = wl_ref[:]
    y = []
    for i in range(3):
        nn_i = jnp.dot(
            onehot, src_ref[0, i], preferred_element_type=jnp.float32
        )
        y_i = jnp.dot(nn_i, wl, preferred_element_type=jnp.float32)
        y_i = y_i + jnp.broadcast_to(
            ydst_ref[0, i][:, None, :], (TN, k, O)
        ).reshape(E, O)
        y.append(y_i)

    d_t = d_ref[:]
    kdir = [
        jnp.dot(y[i], d_t, preferred_element_type=jnp.float32)
        for i in range(3)
    ]
    n2 = kdir[0] ** 2 + kdir[1] ** 2 + kdir[2] ** 2
    inv = 1.0 / jnp.maximum(jnp.sqrt(n2), 1e-12)
    kdir = [kd * inv for kd in kdir]
    qpara = y[0] * kdir[0] + y[1] * kdir[1] + y[2] * kdir[2]
    acted = jnp.where(qpara >= 0, qpara, neg_slope * qpara)
    for i in range(3):
        msg_i = y[i] - qpara * kdir[i] + kdir[i] * acted
        out_ref[0, i] = jnp.mean(msg_i.reshape(TN, k, O), axis=1)


@functools.partial(
    jax.jit, static_argnames=("neg_slope", "interpret", "tile")
)
def fused_edge_mean(
    src_f: Array,   # (B, N_src, C, 3)
    dst_f: Array,   # (B, N_dst, C, 3)
    idx: Array,     # (B, N_dst, K)
    W: Array,       # (O, 2C) VecLNA lin weight
    D: Array,       # (O, O) activation direction weight
    neg_slope: float = 0.2,
    interpret: bool = False,
    tile: int | None = None,
) -> Array:
    """Mean-pooled edge conv; returns (B, N_dst, O, 3). Equals
    mean_K(VecLNA(2C, O)([nn - dst, dst])) up to f32 rounding."""
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W.shape[0]

    W_l = W[:, :C]
    W_delta = W[:, C:] - W[:, :C]
    y_dst = jnp.einsum("oc,bnci->bino", W_delta, dst_f)  # (B, 3, Nd, O)
    src3 = jnp.transpose(src_f, (0, 3, 1, 2))

    TN = tile or _pick_tile(N_dst, N_src, C, O, K)
    out3 = pl.pallas_call(
        functools.partial(
            _mean_edge_kernel,
            n_src=N_src,
            c_out=O,
            k=K,
            neg_slope=neg_slope,
        ),
        grid=(B, N_dst // TN),
        in_specs=[
            pl.BlockSpec(
                (1, 3, N_src, C), lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TN, K), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, N_dst, O), jnp.float32),
        interpret=interpret,
    )(
        src3.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),
        jnp.transpose(D).astype(jnp.float32),
    )
    return jnp.transpose(out3, (0, 2, 3, 1))


def _pick_tile(n_dst: int, n_src: int, c_in: int, c_out: int, k: int) -> int:
    """Largest power-of-two dst tile whose edge working set fits a VMEM
    budget (~6 MB of f32 temps; the onehot matrix and 3-component edge
    tensors dominate)."""
    budget = 6 * 1024 * 1024
    tn = 128
    while tn > 8:
        e = tn * k
        working = 4 * e * (n_src + 3 * (c_in + 2 * c_out + 4 * c_out))
        if working <= budget and n_dst % tn == 0:
            break
        tn //= 2
    while n_dst % tn and tn > 1:
        tn //= 2
    return max(tn, 1)


@functools.partial(
    jax.jit,
    static_argnames=("head_c", "neg_slope", "interpret", "tile"),
)
def fused_edge_attention(
    src_f: Array,    # (B, N_src, C, 3)
    dst_f: Array,    # (B, N_dst, C, 3)
    idx: Array,      # (B, N_dst, K) int32
    q_n: Array,      # (B, N_dst, O, 3) channel-normalized Q
    W_K: Array,      # (O, 2C) VecLNA lin weight, K branch
    D_K: Array,      # (O, O) activation direction weight
    W_V: Array,
    D_V: Array,
    head_c: int = 16,
    neg_slope: float = 0.2,
    interpret: bool = False,
    tile: int | None = None,
) -> Array:
    """Full attention-layer message passing; returns (B, N_dst, O, 3).

    Matches the XLA path in nn/vec_dgcnn_attn.py (fused_kv + attention) up
    to f32 rounding.
    """
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W_K.shape[0]

    # Host-side (cheap, no K axis): dst halves of the two edge convs.
    W_delta = jnp.concatenate(
        [W_K[:, C:] - W_K[:, :C], W_V[:, C:] - W_V[:, :C]], axis=0
    )  # (2O, C)
    y_dst = jnp.einsum("oc,bnci->bino", W_delta, dst_f)  # (B, 3, N_dst, 2O)
    W_l = jnp.concatenate([W_K[:, :C], W_V[:, :C]], axis=0)  # (2O, C)

    src3 = jnp.transpose(src_f, (0, 3, 1, 2))  # (B, 3, N_src, C)
    qn3 = jnp.transpose(q_n, (0, 3, 1, 2))  # (B, 3, N_dst, O)

    TN = tile or _pick_tile(N_dst, N_src, C, O, K)
    grid = (B, N_dst // TN)

    out3 = pl.pallas_call(
        functools.partial(
            _attention_kernel,
            n_src=N_src,
            c_in=C,
            c_out=O,
            k=K,
            head_c=head_c,
            neg_slope=neg_slope,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, N_src, C), lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TN, 2 * O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TN, K), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, 2 * O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, N_dst, O), jnp.float32),
        interpret=interpret,
    )(
        src3.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        qn3.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),  # (C, 2O)
        jnp.transpose(D_K).astype(jnp.float32),
        jnp.transpose(D_V).astype(jnp.float32),
    )
    return jnp.transpose(out3, (0, 2, 3, 1))  # (B, N_dst, O, 3)
