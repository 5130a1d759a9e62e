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
reshapes. The gather itself runs ONCE per tile on a flat (N_src, 3C)
source layout — full MXU lane width instead of three width-C matmuls —
and component selection is folded into exactly-zero-padded weight blocks
(_component_weights), which keeps results bit-identical to per-component
gathers.

Numerics: identical operations to the XLA path up to f32 matmul rounding;
validated in tests/test_pallas_attention.py (interpret mode, CPU).

Round 3: both kernels carry a custom VJP whose backward is ALSO a fused
VMEM-resident Pallas kernel (recompute-in-backward: the bwd kernel
re-derives the edge intermediates from the inputs — activation-checkpoint
style, so no (B, N, K, C, 3) residuals ever hit HBM). Parameter/source
gradients accumulate across dst tiles (and batch) in persistent VMEM
output blocks with @pl.when(first-step) initialization; the scatter back
to source points is the transposed one-hot matmul. Training therefore
runs the Pallas path end to end; gradient equality vs the XLA path is
asserted in tests/test_pallas_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _vec_act_forward(y, d_t, neg_slope):
    """so3 VecActivation (vec_layers.py:261-265) on 3-component lists.
    Returns (out, residuals) where residuals are cheap per-edge tensors
    reused by the in-kernel backward."""
    kdir = [
        jnp.dot(y[i], d_t, preferred_element_type=jnp.float32)
        for i in range(3)
    ]
    n2 = kdir[0] ** 2 + kdir[1] ** 2 + kdir[2] ** 2
    r = jnp.sqrt(n2)
    inv = 1.0 / jnp.maximum(r, 1e-12)
    khat = [kd * inv for kd in kdir]
    qpara = y[0] * khat[0] + y[1] * khat[1] + y[2] * khat[2]
    acted = jnp.where(qpara >= 0, qpara, neg_slope * qpara)
    delta = acted - qpara
    # same float association as the original fused kernels (and the XLA
    # path): y - qpara*khat + khat*acted
    out = [y[i] - qpara * khat[i] + khat[i] * acted for i in range(3)]
    return out, (kdir, khat, inv, r, qpara, delta)


def _vec_act_backward(g, y, d_t, res, neg_slope):
    """VJP of _vec_act_forward w.r.t. (y, d_t). g/y are 3-lists of (E, O).
    Returns (d_y 3-list, d_d_t (O, O) summed over this tile)."""
    kdir, khat, inv, r, qpara, delta = res
    d_y = [g[i] for i in range(3)]
    d_delta = g[0] * khat[0] + g[1] * khat[1] + g[2] * khat[2]
    d_khat = [g[i] * delta for i in range(3)]
    # delta = where(q >= 0, 0, (slope - 1) q)
    d_qpara = d_delta * jnp.where(qpara >= 0, 0.0, neg_slope - 1.0)
    for i in range(3):
        d_y[i] = d_y[i] + d_qpara * khat[i]
        d_khat[i] = d_khat[i] + d_qpara * y[i]
    # khat_i = kdir_i / max(r, eps), r = sqrt(sum kdir_i^2)
    d_kdir = [d_khat[i] * inv for i in range(3)]
    d_inv = (
        d_khat[0] * kdir[0] + d_khat[1] * kdir[1] + d_khat[2] * kdir[2]
    )
    # d r = -d_inv / m^2 masked to r > eps; d kdir_i += kdir_i / r * d r
    d_r = -d_inv * inv * inv * jnp.where(r > 1e-12, 1.0, 0.0)
    coef = d_r * inv  # d n2 * 2 ... (kdir_i / r) * d_r = kdir_i * inv * d_r
    for i in range(3):
        d_kdir[i] = d_kdir[i] + kdir[i] * coef
    # kdir_i = y_i @ d_t
    d_t_mat = d_t  # (O_in, O)  here square (O, O)
    d_d_t = jnp.zeros_like(d_t_mat)
    for i in range(3):
        d_y[i] = d_y[i] + jnp.dot(
            d_kdir[i], d_t_mat.T, preferred_element_type=jnp.float32
        )
        d_d_t = d_d_t + jnp.dot(
            y[i].T, d_kdir[i], preferred_element_type=jnp.float32
        )
    return d_y, d_d_t


def _component_weights(wl):
    """(C, W) -> 3-list of (3C, W) weights with wl in component block i
    and exact zeros elsewhere, so that with the flat source layout
    (lanes [i*C:(i+1)*C] = vector component i)

        dot(nn_flat, wl3[i]) == dot(nn_i, wl)   bit-for-bit

    (the extra contraction terms are 0 * x = exact 0 in the f32
    accumulator). This lets the one-hot gather run ONCE at lane width
    3C instead of three times at width C — at C = 32..64 the per-
    component gather matmuls only fill 32..64 of the MXU's 128 output
    lanes, and the gather is the dominant cost of every fused edge
    layer (docs/ROOFLINE.md encode profile)."""
    c_in = wl.shape[0]
    wl3 = jnp.concatenate([wl, wl, wl], axis=0)  # (3C, W)
    iota = jax.lax.broadcasted_iota(jnp.int32, wl3.shape, 0)
    return [
        wl3 * (iota // c_in == i).astype(jnp.float32) for i in range(3)
    ]


def _block_row_mask(c_in, width, i):
    """(3C, width) mask selecting sublane rows of component block i."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (3 * c_in, width), 0)
    return (iota // c_in == i).astype(jnp.float32)


def _attention_kernel(
    src_ref,     # (1, N_src, 3*C)  flat component layout
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

    # ---- one flat gather (all 3 components, full lane width) + conv ----
    wl3 = _component_weights(wl_ref[:])  # 3 x (3C, 2O)
    nn_flat = jnp.dot(
        onehot, src_ref[0], preferred_element_type=jnp.float32
    )  # (E, 3C)
    yk, yv = [], []
    for i in range(3):
        y_i = jnp.dot(
            nn_flat, wl3[i], preferred_element_type=jnp.float32
        )
        # add the dst half (broadcast each dst row over its K edges)
        y_i = y_i + rep_rows(ydst_ref[0, i])
        yk.append(y_i[:, :O])
        yv.append(y_i[:, O:])

    kf, _ = _vec_act_forward(yk, dk_ref[:], neg_slope)
    vf, _ = _vec_act_forward(yv, dv_ref[:], neg_slope)

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
    src_ref,     # (1, N_src, 3*C)  flat component layout
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

    wl3 = _component_weights(wl_ref[:])
    nn_flat = jnp.dot(
        onehot, src_ref[0], preferred_element_type=jnp.float32
    )  # (E, 3C)
    y = []
    for i in range(3):
        y_i = jnp.dot(
            nn_flat, wl3[i], preferred_element_type=jnp.float32
        )
        y_i = y_i + jnp.broadcast_to(
            ydst_ref[0, i][:, None, :], (TN, k, O)
        ).reshape(E, O)
        y.append(y_i)

    msg, _ = _vec_act_forward(y, d_ref[:], neg_slope)
    for i in range(3):
        out_ref[0, i] = jnp.mean(msg[i].reshape(TN, k, O), axis=1)


def _mean_edge_bwd_kernel(
    src_ref,     # (1, N_src, 3*C)  flat component layout
    ydst_ref,    # (1, 3, TN, O)
    idx_ref,     # (1, TN, K)
    wl_ref,      # (C, O)
    d_ref,       # (O, O)
    g_ref,       # (1, 3, TN, O) upstream cotangent
    dsrc_ref,    # out (1, N_src, 3*C)   accumulated over dst tiles
    dydst_ref,   # out (1, 3, TN, O)
    dwl_ref,     # out (3*C, O)  block i = nn_i^T d_y_i; fold in XLA
    dd_ref,      # out (O, O)            accumulated over batch + tiles
    *,
    n_src: int,
    c_out: int,
    k: int,
    neg_slope: float,
):
    """Backward of the fused mean edge conv: recompute the edge pipeline,
    then push the cotangent through mean -> VecActivation -> edge conv ->
    one-hot^T scatter. Parameter/source grads accumulate in persistent
    VMEM output blocks (first-grid-step init)."""
    TN = idx_ref.shape[1]
    E = TN * k
    O = c_out
    b = pl.program_id(0)
    t = pl.program_id(1)

    src_iota = jax.lax.broadcasted_iota(jnp.int32, (TN, k, n_src), 2)
    onehot = (
        (src_iota == idx_ref[0][..., None]).astype(jnp.float32)
    ).reshape(E, n_src)

    wl3 = _component_weights(wl_ref[:])
    c_in = wl_ref.shape[0]
    nn_flat = jnp.dot(
        onehot, src_ref[0], preferred_element_type=jnp.float32
    )  # (E, 3C)
    y = []
    for i in range(3):
        y_i = jnp.dot(
            nn_flat, wl3[i], preferred_element_type=jnp.float32
        )
        y_i = y_i + jnp.broadcast_to(
            ydst_ref[0, i][:, None, :], (TN, k, O)
        ).reshape(E, O)
        y.append(y_i)

    _, res = _vec_act_forward(y, d_ref[:], neg_slope)

    inv_k = 1.0 / jnp.float32(k)
    g = [
        jnp.broadcast_to(
            g_ref[0, i][:, None, :], (TN, k, O)
        ).reshape(E, O)
        * inv_k
        for i in range(3)
    ]
    d_y, d_d = _vec_act_backward(g, y, d_ref[:], res, neg_slope)

    # d_nn accumulates flat ((E, 3C), block i from d_y_i @ wl^T) so the
    # one-hot^T scatter also runs once at full lane width; dwl comes out
    # block-stacked (3C, O) and is folded (sum over blocks) in XLA.
    dwl_acc = jnp.zeros((3 * c_in, O), jnp.float32)
    d_nn_flat = jnp.zeros_like(nn_flat)
    for i in range(3):
        d_nn_flat = d_nn_flat + jnp.dot(
            d_y[i], wl3[i].T, preferred_element_type=jnp.float32
        )  # (E, 3C), component block i
        dwl_acc = dwl_acc + jnp.dot(
            nn_flat.T, d_y[i], preferred_element_type=jnp.float32
        ) * _block_row_mask(c_in, O, i)
        dydst_ref[0, i] = jnp.sum(d_y[i].reshape(TN, k, O), axis=1)

    dsrc_flat = jnp.dot(
        onehot.T, d_nn_flat, preferred_element_type=jnp.float32
    )  # (N_src, 3C)

    @pl.when(t == 0)
    def _():
        dsrc_ref[0] = dsrc_flat

    @pl.when(t != 0)
    def _():
        dsrc_ref[0] = dsrc_ref[0] + dsrc_flat

    first = (b == 0) & (t == 0)

    @pl.when(first)
    def _():
        dwl_ref[:] = dwl_acc
        dd_ref[:] = d_d

    @pl.when(jnp.logical_not(first))
    def _():
        dwl_ref[:] = dwl_ref[:] + dwl_acc
        dd_ref[:] = dd_ref[:] + d_d


def _mean_prep(src_f, dst_f, W, D):
    B, N_src, C, _ = src_f.shape
    W_l = W[:, :C]
    W_delta = W[:, C:] - W[:, :C]
    y_dst = jnp.einsum("oc,bnci->bino", W_delta, dst_f)  # (B, 3, Nd, O)
    # Flat component layout for the single wide gather: lane i*C + c is
    # component i of channel c.
    src_flat = jnp.transpose(src_f, (0, 1, 3, 2)).reshape(B, N_src, 3 * C)
    return src_flat, y_dst, W_l, W_delta


def _mean_fwd_impl(src_f, dst_f, idx, W, D, neg_slope, interpret, tile):
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W.shape[0]
    src_flat, y_dst, W_l, _ = _mean_prep(src_f, dst_f, W, D)

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
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
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
        src_flat.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),
        jnp.transpose(D).astype(jnp.float32),
    )
    return jnp.transpose(out3, (0, 2, 3, 1))


def _mean_bwd_impl(src_f, dst_f, idx, W, D, g, neg_slope, interpret, tile):
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W.shape[0]
    src_flat, y_dst, W_l, W_delta = _mean_prep(src_f, dst_f, W, D)
    g3 = jnp.transpose(g, (0, 3, 1, 2))  # (B, 3, Nd, O)

    TN = tile or _pick_tile(N_dst, N_src, C, O, K, factor=2)
    out_shapes = (
        jax.ShapeDtypeStruct((B, N_src, 3 * C), jnp.float32),  # d_src_flat
        jax.ShapeDtypeStruct((B, 3, N_dst, O), jnp.float32),  # d_ydst
        jax.ShapeDtypeStruct((3 * C, O), jnp.float32),        # d_wl blocks
        jax.ShapeDtypeStruct((O, O), jnp.float32),            # d_d
    )
    d_src_flat, d_ydst, d_wl3_t, d_d_t = pl.pallas_call(
        functools.partial(
            _mean_edge_bwd_kernel,
            n_src=N_src,
            c_out=O,
            k=K,
            neg_slope=neg_slope,
        ),
        grid=(B, N_dst // TN),
        in_specs=[
            pl.BlockSpec(
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
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
            pl.BlockSpec(
                (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3 * C, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        src_flat.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),
        jnp.transpose(D).astype(jnp.float32),
        g3.astype(jnp.float32),
    )
    d_src_f = jnp.transpose(
        d_src_flat.reshape(B, N_src, 3, C), (0, 1, 3, 2)
    ).astype(src_f.dtype)
    d_dst_f = jnp.einsum("oc,bino->bnci", W_delta, d_ydst).astype(
        dst_f.dtype
    )
    d_W_delta = jnp.einsum("bino,bnci->oc", d_ydst, dst_f)
    d_wl_t = d_wl3_t.reshape(3, C, O).sum(0)
    d_W_l = jnp.transpose(d_wl_t)
    d_W = jnp.concatenate(
        [d_W_l - d_W_delta, d_W_delta], axis=1
    ).astype(W.dtype)
    d_D = jnp.transpose(d_d_t).astype(D.dtype)
    return d_src_f, d_dst_f, d_W, d_D


def _int_zero_cot(idx):
    import numpy as np

    return np.zeros(idx.shape, dtype=jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def _mean_core(neg_slope: float, interpret: bool, tile):
    @jax.custom_vjp
    def core(src_f, dst_f, idx, W, D):
        return _mean_fwd_impl(
            src_f, dst_f, idx, W, D, neg_slope, interpret, tile
        )

    def fwd(src_f, dst_f, idx, W, D):
        out = _mean_fwd_impl(
            src_f, dst_f, idx, W, D, neg_slope, interpret, tile
        )
        return out, (src_f, dst_f, idx, W, D)

    def bwd(res, g):
        src_f, dst_f, idx, W, D = res
        d_src, d_dst, d_W, d_D = _mean_bwd_impl(
            src_f, dst_f, idx, W, D, g, neg_slope, interpret, tile
        )
        return d_src, d_dst, _int_zero_cot(idx), d_W, d_D

    core.defvjp(fwd, bwd)
    return core


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
    mean_K(VecLNA(2C, O)([nn - dst, dst])) up to f32 rounding.
    Differentiable: custom VJP backed by _mean_edge_bwd_kernel."""
    return _mean_core(neg_slope, interpret, tile)(
        src_f, dst_f, idx, W, D
    )


def _pick_tile(
    n_dst: int, n_src: int, c_in: int, c_out: int, k: int, factor: int = 1
) -> int:
    """Largest power-of-two dst tile whose edge working set fits a VMEM
    budget (~6 MB of f32 temps; the onehot matrix and 3-component edge
    tensors dominate). `factor` scales the working-set estimate (the
    backward kernels hold roughly twice the forward's live temps)."""
    budget = 6 * 1024 * 1024
    tn = 128
    while tn > 8:
        e = tn * k
        working = factor * 4 * e * (
            n_src + 3 * (c_in + 2 * c_out + 4 * c_out)
        )
        if working <= budget and n_dst % tn == 0:
            break
        tn //= 2
    while n_dst % tn and tn > 1:
        tn //= 2
    return max(tn, 1)


def _attention_bwd_kernel(
    src_ref,     # (1, N_src, 3*C)  flat component layout
    ydst_ref,    # (1, 3, TN, 2*O)
    qn_ref,      # (1, 3, TN, O)
    idx_ref,     # (1, TN, K)
    wl_ref,      # (C, 2*O)
    dk_ref,      # (O, O)
    dv_ref,      # (O, O)
    g_ref,       # (1, 3, TN, O) upstream cotangent
    dsrc_ref,    # out (1, N_src, 3*C)    accumulated over dst tiles
    dydst_ref,   # out (1, 3, TN, 2*O)
    dqn_ref,     # out (1, 3, TN, O)
    dwl_ref,     # out (3*C, 2*O)  block i = nn_i^T d_y_i; fold in XLA
    ddk_ref,     # out (O, O)             accumulated over batch + tiles
    ddv_ref,     # out (O, O)             accumulated over batch + tiles
    *,
    n_src: int,
    c_in: int,
    c_out: int,
    k: int,
    head_c: int,
    neg_slope: float,
):
    """Backward of the fused attention layer. Recomputes the forward edge
    pipeline in VMEM, then walks the cotangent through K-reduce ->
    softmax -> q.k -> channel normalization -> both VecActivations ->
    edge convs -> one-hot^T scatter."""
    TN = idx_ref.shape[1]
    E = TN * k
    O = c_out
    b = pl.program_id(0)
    t = pl.program_id(1)
    eps = 1e-12

    def rep_rows(x):
        W = x.shape[-1]
        return jnp.broadcast_to(x[:, None, :], (TN, k, W)).reshape(E, W)

    src_iota = jax.lax.broadcasted_iota(jnp.int32, (TN, k, n_src), 2)
    onehot = (
        (src_iota == idx_ref[0][..., None]).astype(jnp.float32)
    ).reshape(E, n_src)

    # ---- recompute forward -------------------------------------------
    wl3 = _component_weights(wl_ref[:])
    nn_flat = jnp.dot(
        onehot, src_ref[0], preferred_element_type=jnp.float32
    )  # (E, 3C)
    yk, yv = [], []
    for i in range(3):
        y_i = jnp.dot(
            nn_flat, wl3[i], preferred_element_type=jnp.float32
        )
        y_i = y_i + rep_rows(ydst_ref[0, i])
        yk.append(y_i[:, :O])
        yv.append(y_i[:, O:])

    kf, res_k = _vec_act_forward(yk, dk_ref[:], neg_slope)
    vf, res_v = _vec_act_forward(yv, dv_ref[:], neg_slope)

    knorm = jnp.sqrt(
        jnp.maximum(kf[0] ** 2 + kf[1] ** 2 + kf[2] ** 2, 0.0)
    )
    cross = jnp.sqrt(jnp.sum(knorm * knorm, axis=-1, keepdims=True))
    mc = jnp.maximum(cross, eps)
    mk = jnp.maximum(knorm, eps)
    a = knorm / mc
    scale = a / mk
    kscaled = [kf[i] * scale for i in range(3)]
    qn_rep = [rep_rows(qn_ref[0, i]) for i in range(3)]
    qk = (
        kscaled[0] * qn_rep[0]
        + kscaled[1] * qn_rep[1]
        + kscaled[2] * qn_rep[2]
    )
    n_head = O // head_c
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (O, n_head), 0)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (O, n_head), 1)
    headmat = (lane_o // head_c == lane_h).astype(jnp.float32)
    s = jnp.sqrt(jnp.float32(3 * head_c))
    logits = jnp.dot(qk, headmat, preferred_element_type=jnp.float32) / s
    lg = logits.reshape(TN, k, n_head)
    m = jnp.max(lg, axis=1, keepdims=True)
    ex = jnp.exp(lg - m)
    attn3 = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TN, K, H)
    attn_full = jnp.dot(
        attn3.reshape(E, n_head), headmat.T,
        preferred_element_type=jnp.float32,
    )  # (E, O)

    # ---- backward ----------------------------------------------------
    grep = [rep_rows(g_ref[0, i]) for i in range(3)]
    d_vf = [grep[i] * attn_full for i in range(3)]
    d_attn_full = (
        grep[0] * vf[0] + grep[1] * vf[1] + grep[2] * vf[2]
    )  # (E, O)
    d_attn3 = jnp.dot(
        d_attn_full, headmat, preferred_element_type=jnp.float32
    ).reshape(TN, k, n_head)
    dlg = attn3 * (
        d_attn3 - jnp.sum(attn3 * d_attn3, axis=1, keepdims=True)
    )
    d_qk = (
        jnp.dot(
            dlg.reshape(E, n_head), headmat.T,
            preferred_element_type=jnp.float32,
        )
        / s
    )  # (E, O)

    d_kf = []
    d_scale = jnp.zeros((E, O), jnp.float32)
    for i in range(3):
        d_ks_i = d_qk * qn_rep[i]
        dqn_ref[0, i] = jnp.sum(
            (d_qk * kscaled[i]).reshape(TN, k, O), axis=1
        )
        d_kf.append(d_ks_i * scale)
        d_scale = d_scale + d_ks_i * kf[i]

    d_a = d_scale / mk
    d_mk = -d_scale * a / (mk * mk)
    d_knorm = d_mk * (knorm > eps).astype(jnp.float32) + d_a / mc
    d_mc = -jnp.sum(d_a * knorm, axis=-1, keepdims=True) / (mc * mc)
    d_cross = d_mc * (cross > eps).astype(jnp.float32)
    d_knorm = d_knorm + d_cross * knorm / mc
    coef = d_knorm / mk
    for i in range(3):
        d_kf[i] = d_kf[i] + coef * kf[i]

    d_yk, d_dk = _vec_act_backward(d_kf, yk, dk_ref[:], res_k, neg_slope)
    d_yv, d_dv = _vec_act_backward(d_vf, yv, dv_ref[:], res_v, neg_slope)

    c_in = wl_ref.shape[0]
    dwl_acc = jnp.zeros((3 * c_in, 2 * O), jnp.float32)
    d_nn_flat = jnp.zeros_like(nn_flat)
    for i in range(3):
        d_y_i = jnp.concatenate([d_yk[i], d_yv[i]], axis=1)  # (E, 2O)
        d_nn_flat = d_nn_flat + jnp.dot(
            d_y_i, wl3[i].T, preferred_element_type=jnp.float32
        )  # (E, 3C), component block i
        dwl_acc = dwl_acc + jnp.dot(
            nn_flat.T, d_y_i, preferred_element_type=jnp.float32
        ) * _block_row_mask(c_in, 2 * O, i)
        dydst_ref[0, i] = jnp.sum(d_y_i.reshape(TN, k, 2 * O), axis=1)

    dsrc_flat = jnp.dot(
        onehot.T, d_nn_flat, preferred_element_type=jnp.float32
    )  # (N_src, 3C)

    @pl.when(t == 0)
    def _():
        dsrc_ref[0] = dsrc_flat

    @pl.when(t != 0)
    def _():
        dsrc_ref[0] = dsrc_ref[0] + dsrc_flat

    first = (b == 0) & (t == 0)

    @pl.when(first)
    def _():
        dwl_ref[:] = dwl_acc
        ddk_ref[:] = d_dk
        ddv_ref[:] = d_dv

    @pl.when(jnp.logical_not(first))
    def _():
        dwl_ref[:] = dwl_ref[:] + dwl_acc
        ddk_ref[:] = ddk_ref[:] + d_dk
        ddv_ref[:] = ddv_ref[:] + d_dv


def _attn_prep(src_f, dst_f, q_n, W_K, W_V):
    B, N_src, C, _ = src_f.shape
    W_delta = jnp.concatenate(
        [W_K[:, C:] - W_K[:, :C], W_V[:, C:] - W_V[:, :C]], axis=0
    )  # (2O, C)
    y_dst = jnp.einsum("oc,bnci->bino", W_delta, dst_f)  # (B, 3, Nd, 2O)
    W_l = jnp.concatenate([W_K[:, :C], W_V[:, :C]], axis=0)  # (2O, C)
    src_flat = jnp.transpose(src_f, (0, 1, 3, 2)).reshape(B, N_src, 3 * C)
    qn3 = jnp.transpose(q_n, (0, 3, 1, 2))
    return src_flat, y_dst, qn3, W_l, W_delta


def _attn_fwd_impl(
    src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V,
    head_c, neg_slope, interpret, tile,
):
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W_K.shape[0]
    src_flat, y_dst, qn3, W_l, _ = _attn_prep(src_f, dst_f, q_n, W_K, W_V)

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
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
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
        src_flat.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        qn3.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),  # (C, 2O)
        jnp.transpose(D_K).astype(jnp.float32),
        jnp.transpose(D_V).astype(jnp.float32),
    )
    return jnp.transpose(out3, (0, 2, 3, 1))  # (B, N_dst, O, 3)


def _attn_bwd_impl(
    src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V, g,
    head_c, neg_slope, interpret, tile,
):
    B, N_src, C, _ = src_f.shape
    N_dst = dst_f.shape[1]
    K = idx.shape[-1]
    O = W_K.shape[0]
    src_flat, y_dst, qn3, W_l, W_delta = _attn_prep(
        src_f, dst_f, q_n, W_K, W_V
    )
    g3 = jnp.transpose(g, (0, 3, 1, 2))  # (B, 3, Nd, O)

    TN = tile or _pick_tile(N_dst, N_src, C, O, K, factor=3)
    out_shapes = (
        jax.ShapeDtypeStruct((B, N_src, 3 * C), jnp.float32),  # d_src_flat
        jax.ShapeDtypeStruct((B, 3, N_dst, 2 * O), jnp.float32),  # d_ydst
        jax.ShapeDtypeStruct((B, 3, N_dst, O), jnp.float32),    # d_qn3
        jax.ShapeDtypeStruct((3 * C, 2 * O), jnp.float32),      # d_wl blocks
        jax.ShapeDtypeStruct((O, O), jnp.float32),              # d_dk
        jax.ShapeDtypeStruct((O, O), jnp.float32),              # d_dv
    )
    (
        d_src_flat, d_ydst, d_qn3, d_wl3_t, d_dk_t, d_dv_t
    ) = pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel,
            n_src=N_src,
            c_in=C,
            c_out=O,
            k=K,
            head_c=head_c,
            neg_slope=neg_slope,
        ),
        grid=(B, N_dst // TN),
        in_specs=[
            pl.BlockSpec(
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
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
            pl.BlockSpec(
                (1, 3, TN, O), lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, N_src, 3 * C), lambda b, t: (b, 0, 0),
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
                (3 * C, 2 * O), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (O, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        src_flat.astype(jnp.float32),
        y_dst.astype(jnp.float32),
        qn3.astype(jnp.float32),
        idx.astype(jnp.int32),
        jnp.transpose(W_l).astype(jnp.float32),
        jnp.transpose(D_K).astype(jnp.float32),
        jnp.transpose(D_V).astype(jnp.float32),
        g3.astype(jnp.float32),
    )
    d_src_f = jnp.transpose(
        d_src_flat.reshape(B, N_src, 3, C), (0, 1, 3, 2)
    ).astype(src_f.dtype)
    d_dst_f = jnp.einsum("oc,bino->bnci", W_delta, d_ydst).astype(
        dst_f.dtype
    )
    d_q_n = jnp.transpose(d_qn3, (0, 2, 3, 1)).astype(q_n.dtype)
    d_W_delta = jnp.einsum("bino,bnci->oc", d_ydst, dst_f)  # (2O, C)
    d_wl_t = d_wl3_t.reshape(3, C, 2 * O).sum(0)
    d_W_l = jnp.transpose(d_wl_t)  # (2O, C)
    d_W_K = jnp.concatenate(
        [d_W_l[:O] - d_W_delta[:O], d_W_delta[:O]], axis=1
    ).astype(W_K.dtype)
    d_W_V = jnp.concatenate(
        [d_W_l[O:] - d_W_delta[O:], d_W_delta[O:]], axis=1
    ).astype(W_V.dtype)
    d_D_K = jnp.transpose(d_dk_t).astype(D_K.dtype)
    d_D_V = jnp.transpose(d_dv_t).astype(D_V.dtype)
    return d_src_f, d_dst_f, d_q_n, d_W_K, d_D_K, d_W_V, d_D_V


@functools.lru_cache(maxsize=None)
def _attn_core(head_c: int, neg_slope: float, interpret: bool, tile):
    @jax.custom_vjp
    def core(src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V):
        return _attn_fwd_impl(
            src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V,
            head_c, neg_slope, interpret, tile,
        )

    def fwd(src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V):
        out = _attn_fwd_impl(
            src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V,
            head_c, neg_slope, interpret, tile,
        )
        return out, (src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V)

    def bwd(res, g):
        src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V = res
        d_src, d_dst, d_qn, d_WK, d_DK, d_WV, d_DV = _attn_bwd_impl(
            src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V, g,
            head_c, neg_slope, interpret, tile,
        )
        return (
            d_src, d_dst, _int_zero_cot(idx), d_qn,
            d_WK, d_DK, d_WV, d_DV,
        )

    core.defvjp(fwd, bwd)
    return core


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
    to f32 rounding. Differentiable: custom VJP backed by
    _attention_bwd_kernel."""
    return _attn_core(head_c, neg_slope, interpret, tile)(
        src_f, dst_f, idx, q_n, W_K, D_K, W_V, D_V
    )
