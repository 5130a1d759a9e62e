"""SIM(3)-equivariant Vector-Neuron layer library (flax.linen).

Re-design of the reference VN layer zoo
(lib_shape_prior/core/lib/vec_sim3/vec_layers.py) for TPU:

* Tensor layout is `(..., C, 3)` with arbitrary leading batch/point axes
  (the reference uses `(B, C, 3, N)`). Keeping the channel x 3 block last
  means every channel-mixing op is a single `einsum` that XLA tiles onto
  the MXU, and point/neighbor axes vmap away.
* All layers are pure functions of their parameters — no mutable state, no
  batch-norm variants (the reference never enables them in production since
  they break scale equivariance, see vec_layers.py:239).

Equivariance contract (verified in tests/test_vec_layers.py, mirroring the
reference self-tests at vec_layers.py:698-821):
  so3 mode:  f(s·R·x) = s·R·f(x)
  se3 mode:  f(s·R·x + t) = s·R·f(x) + t   (per-channel translation)
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def safe_divide(x: Array, y: Array, eps: float = 1e-8) -> Array:
    """x / y with eps added only to near-zero denominators (vec_layers.py:15)."""
    unstable = (jnp.abs(y) < eps).astype(y.dtype) * jnp.sign(y)
    return x / (y + unstable * eps)


def _normalize(x: Array, axis: int, eps: float = 1e-12) -> Array:
    """L2-normalize along `axis` (torch F.normalize semantics: clamp norm)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def channel_equi_vec_normalize(x: Array) -> Array:
    """Scale-factoring normalization (vec_layers.py:24-31).

    x: (..., C, 3). Per-channel direction times the cross-channel-normalized
    channel norm; SO(3)-equivariant and scale-invariant.
    """
    x_dir = _normalize(x, axis=-1)
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)  # (..., C, 1)
    x_normalized_norm = _normalize(x_norm, axis=-2)  # across C
    return x_dir * x_normalized_norm


class VecLinear(nn.Module):
    """Channel-mixing linear map on vector features, with optional scalar
    in/out paths (reference VecLinear, vec_layers.py:34-210).

    Vector path: v_out[c] = sum_c' W[c, c'] v_in[c'].
    se3 mode constrains each row of W to sum to 1 (affine combination of
    points — translation equivariant), implemented as the reference does by
    storing (v_out, v_in - 1) free weights and letting the last column be
    1 - sum(free) (vec_layers.py:128-131).

    Scalar-to-vector: invariant per-channel scale on the centered vector
    output (vec_layers.py:166-175). Vector-to-scalar: inner products with a
    learned dual direction field (vec_layers.py:194-207).
    """

    v_in: int
    v_out: int
    s_in: int = 0
    s_out: int = 0
    mode: str = "se3"
    s2v_normalized_scale: bool = True
    cross: bool = False
    # Run the channel-mixing matmul in bfloat16 with float32 accumulation
    # (MXU-native). Equivariance is preserved structurally; rounding noise
    # is per-matmul only (no bf16 compounding through norms/activations).
    mm_bf16: bool = False

    @property
    def se3(self) -> bool:
        return self.mode == "se3"

    def _weight(self):
        def init(key, shape, dtype=jnp.float32):
            # kaiming_uniform(a=sqrt(5)) like torch Linear default
            fan_in = shape[1]
            bound = jnp.sqrt(1.0 / fan_in)
            w = jax.random.uniform(key, shape, dtype, -bound, bound)
            if self.se3:
                w = w + 1.0 / self.v_in
            return w

        cols = self.v_in - 1 if self.se3 else self.v_in
        return self.param("weight", init, (self.v_out, cols))

    @nn.compact
    def __call__(self, v: Array, s: Optional[Array] = None):
        """v: (..., C_in, 3); s: (..., S_in) or None."""
        assert v.shape[-1] == 3, "vector neurons live in R^3"
        v_out = None
        if self.v_out > 0:
            W = self._weight()
            if self.se3:
                last = 1.0 - jnp.sum(W, axis=-1, keepdims=True)
                W = jnp.concatenate([W, last], axis=-1)
            if self.mm_bf16 and v.dtype == jnp.float32:
                v_out = jnp.einsum(
                    "oc,...ci->...oi",
                    W.astype(jnp.bfloat16),
                    v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                v_out = jnp.einsum("oc,...ci->...oi", W, v)

        if self.s_in > 0 and self.v_out > 0:
            assert s is not None, "missing scalar input"
            scale = nn.Dense(self.v_out, name="sv_linear")(s)  # (..., v_out)
            if self.s2v_normalized_scale:
                scale = _normalize(scale, axis=-1)
            if self.se3:
                v_mean = jnp.mean(v_out, axis=-2, keepdims=True)
                v_out = (v_out - v_mean) * scale[..., None] + v_mean
            else:
                v_out = v_out * scale[..., None]

        if self.v_out > 0 and self.cross:
            v_dual = VecLinear(
                self.v_in, self.v_out, mode=self.mode, name="v_out_cross",
                mm_bf16=self.mm_bf16,
            )(v)
            if self.se3:
                dual_o = jnp.mean(v_dual, axis=-2, keepdims=True)
                out_o = jnp.mean(v_out, axis=-2, keepdims=True)
                v_cross = jnp.cross(
                    channel_equi_vec_normalize(v_dual - dual_o), v_out - out_o
                )
            else:
                v_cross = jnp.cross(channel_equi_vec_normalize(v_dual), v_out)
            v_cross = v_cross + v_out
            v_out = VecLinear(
                self.v_out * 2, self.v_out, mode=self.mode,
                name="v_out_cross_fc", mm_bf16=self.mm_bf16,
            )(jnp.concatenate([v_cross, v_out], axis=-2))

        if self.s_out > 0:
            v_sR = (
                v - jnp.mean(v, axis=-2, keepdims=True) if self.se3 else v
            )
            dual_dir = _normalize(
                VecLinear(self.v_in, self.v_in, mode="so3", name="vs_dir_linear")(
                    v_sR
                ),
                axis=-1,
            )
            s_from_v = _normalize(
                jnp.sum(v_sR * dual_dir, axis=-1), axis=-1
            )  # (..., C_in), invariant
            s_from_v = nn.Dense(self.s_out, name="vs_linear")(s_from_v)
            if self.s_in > 0:
                s_from_s = nn.Dense(self.s_out, name="ss_linear")(s)
                s_out = s_from_s + s_from_v
            else:
                s_out = s_from_v
            return v_out, s_out
        return v_out


class VecActivation(nn.Module):
    """Direction-gated nonlinearity (reference VecActivation,
    vec_layers.py:213-268).

    Predicts a direction field k (and origin o in se3 mode), applies the
    scalar activation to the component of the feature parallel to k, and
    keeps the orthogonal component.
    """

    in_features: int
    act_func: Callable[[Array], Array]
    shared_nonlinearity: bool = False
    mode: str = "se3"
    cross: bool = False
    mm_bf16: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert x.shape[-1] == 3
        nonlinear_out = 1 if self.shared_nonlinearity else self.in_features
        q = x
        k = VecLinear(
            self.in_features, nonlinear_out, mode=self.mode,
            cross=self.cross, name="lin_dir", mm_bf16=self.mm_bf16,
        )(x)
        if self.mode == "se3":
            o = VecLinear(
                self.in_features, nonlinear_out, mode=self.mode,
                cross=self.cross, name="lin_ori", mm_bf16=self.mm_bf16,
            )(x)
            q = q - o
            k = k - o
        k_dir = _normalize(k, axis=-1)
        q_para_len = jnp.sum(q * k_dir, axis=-1, keepdims=True)
        q_orth = q - q_para_len * k_dir
        q_acted = q_orth + k_dir * self.act_func(q_para_len)
        if self.mode == "se3":
            q_acted = q_acted + o
        return q_acted


class VecLNA(nn.Module):
    """VecLinear + VecActivation, optionally hybrid vector/scalar
    (reference VecLinearNormalizeActivate, vec_layers.py:488-534)."""

    in_features: int
    out_features: int
    act_func: Callable[[Array], Array]
    s_in_features: int = 0
    s_out_features: int = 0
    shared_nonlinearity: bool = False
    mode: str = "se3"
    cross: bool = False
    mm_bf16: bool = False

    @nn.compact
    def __call__(self, v: Array, s: Optional[Array] = None):
        lin = VecLinear(
            self.in_features,
            self.out_features,
            s_in=self.s_in_features,
            s_out=self.s_out_features,
            mode=self.mode,
            cross=self.cross,
            name="lin",
            mm_bf16=self.mm_bf16,
        )
        act = VecActivation(
            self.out_features,
            self.act_func,
            self.shared_nonlinearity,
            self.mode,
            cross=self.cross,
            name="act",
            mm_bf16=self.mm_bf16,
        )
        if self.s_out_features > 0:
            v_out, s_out = lin(v, s)
            return act(v_out), self.act_func(s_out)
        v_out = lin(v, s)
        return act(v_out)


class VecResBlock(nn.Module):
    """Residual VN block (reference VecResBlock, vec_layers.py:537-672).

    fc0 (VecLNA) -> lin1 (VecLinear); residual shortcut (VecLinear if channel
    counts differ); in se3 mode an extra `subtract` branch removes the
    duplicated translation introduced by summing two se3-equivariant paths
    (vec_layers.py:618-621,647-649).
    """

    in_features: int
    out_features: int
    hidden_features: int
    act_func: Callable[[Array], Array]
    mode: str = "se3"
    s_in_features: int = 0
    s_out_features: int = 0
    s_hidden_features: int = 0
    last_activate: bool = True
    cross: bool = False

    @nn.compact
    def __call__(self, v: Array, s: Optional[Array] = None):
        if self.s_in_features == 0:
            s = None

        fc0 = VecLNA(
            self.in_features,
            self.hidden_features,
            act_func=self.act_func,
            s_in_features=self.s_in_features,
            s_out_features=self.s_hidden_features,
            mode=self.mode,
            cross=self.cross,
            name="fc0",
        )
        out = fc0(v, s)
        v_net, s_net = out if isinstance(out, tuple) else (out, None)

        lin1 = VecLinear(
            self.hidden_features,
            self.out_features,
            s_in=self.s_hidden_features,
            s_out=self.s_out_features,
            mode=self.mode,
            cross=self.cross,
            name="lin1",
        )
        out = lin1(v_net, s_net)
        dv, ds = out if isinstance(out, tuple) else (out, None)

        if self.in_features != self.out_features:
            v_s = VecLinear(
                self.in_features, self.out_features, mode=self.mode,
                name="shortcut",
            )(v)
        else:
            v_s = v
        v_out = v_s + dv
        if self.mode == "se3":
            v_out = v_out - VecLinear(
                self.in_features, self.out_features, mode="se3", name="subtract"
            )(v)
        if self.last_activate:
            v_out = VecActivation(
                self.out_features, self.act_func, False, self.mode,
                cross=self.cross, name="act2",
            )(v_out)

        if ds is not None:
            if (
                self.s_in_features > 0
                and self.s_out_features > 0
                and self.s_in_features != self.s_out_features
            ):
                s_out = nn.Dense(self.s_out_features, name="s_shortcut")(s) + ds
            elif s is not None:
                s_out = s + ds
            else:
                s_out = ds
            if self.last_activate:
                s_out = self.act_func(s_out)
            return v_out, s_out
        return v_out


def vec_mean_pool(x: Array, axis: int = -3) -> Array:
    """Mean pool over a point/neighbor axis of (..., N, C, 3)."""
    return jnp.mean(x, axis=axis)


class VecMaxPool(nn.Module):
    """Equivariant max / attention pooling over a point axis
    (reference VecMaxPool, vec_layers.py:283-389).

    Input (..., N, C, 3), pooled over N (axis -3). A key field k is
    predicted (per-point linear, or the attention-style pooled mean passed
    through a key block); with softmax_factor > 0 the SIM(3)-invariant
    q.k similarity drives softmax attention pooling, otherwise a hard
    argmax selects one vector per channel.
    """

    in_features: int
    mode: str = "se3"
    softmax_factor: float = -1.0
    k_prediction: str = "lin"  # "lin" | "mean" (attention)
    attention_k_blk: bool = True
    softmax_norm_compression: str = "sigmoid"  # "sigmoid" | "exp"
    shared_nonlinearity: bool = False

    def _compress(self, x: Array) -> Array:
        ln = jnp.linalg.norm(x, axis=-1, keepdims=True)
        direction = x / jnp.maximum(ln, 1e-12)
        if self.softmax_norm_compression == "sigmoid":
            return direction * jax.nn.sigmoid(ln)
        return direction * (1.0 - jnp.exp(-ln))

    @nn.compact
    def __call__(self, x: Array, return_weight: bool = False):
        assert x.shape[-1] == 3
        nonlinear_out = 1 if self.shared_nonlinearity else self.in_features
        q = x
        if self.k_prediction == "lin":
            k = VecLinear(
                self.in_features, nonlinear_out, mode=self.mode, name="lin_dir"
            )(x)
        elif self.k_prediction == "mean":
            k = jnp.mean(x, axis=-3, keepdims=True)
            if self.attention_k_blk:
                k = VecResBlock(
                    self.in_features,
                    self.in_features,
                    self.in_features,
                    act_func=lambda v: jax.nn.leaky_relu(v, 0.2),
                    mode=self.mode,
                    last_activate=False,
                    name="attention_blk",
                )(k)
        else:
            raise NotImplementedError(self.k_prediction)
        if self.mode == "se3":
            o = VecLinear(
                self.in_features, nonlinear_out, mode=self.mode, name="lin_ori"
            )(x)
            q = q - o
            k = k - o
        k_scale = jnp.linalg.norm(
            jnp.mean(k, axis=-2, keepdims=True), axis=-1, keepdims=True
        )
        k = jnp.broadcast_to(k, q.shape)
        k_inv = self._compress(safe_divide(k, k_scale))

        if self.softmax_factor > 0.0:
            q_inv = self._compress(safe_divide(q, k_scale))
            sim = jnp.mean(q_inv * k_inv, axis=-1, keepdims=True)
            w = jax.nn.softmax(self.softmax_factor * sim, axis=-3)
            out = jnp.sum(x * w, axis=-3)
            return (out, w) if return_weight else out
        # hard max pool on the parallel-component length
        q_para = jnp.sum(q * k_inv, axis=-1)  # (..., N, C)
        sel = jnp.argmax(q_para, axis=-2)  # (..., C)
        out = jnp.take_along_axis(x, sel[..., None, :, None], axis=-3)[
            ..., 0, :, :
        ]
        return (out, None) if return_weight else out


class VecMaxPoolV2(nn.Module):
    """v2 pooling: channel-wise normalization factors out scale — no
    safe_divide needed (reference VecMaxPoolV2, vec_layers.py:392-485)."""

    in_features: int
    mode: str = "se3"
    softmax_factor: float = -1.0
    attention_k_blk: bool = True

    @nn.compact
    def __call__(self, x: Array, return_weight: bool = False):
        assert x.shape[-1] == 3
        q = x
        k = jnp.mean(x, axis=-3, keepdims=True)
        if self.attention_k_blk:
            k = VecResBlock(
                self.in_features,
                self.in_features,
                self.in_features,
                act_func=lambda v: jax.nn.leaky_relu(v, 0.2),
                mode=self.mode,
                last_activate=False,
                name="attention_blk",
            )(k)
        if self.mode == "se3":
            o = VecLinear(
                self.in_features, self.in_features, mode=self.mode,
                name="lin_ori",
            )(k)
            q = q - o
            k = k - o
        k_inv = channel_equi_vec_normalize(k)
        if self.softmax_factor > 0.0:
            q_inv = channel_equi_vec_normalize(q)
            sim = jnp.mean(q_inv * k_inv, axis=-1, keepdims=True)
            w = jax.nn.softmax(self.softmax_factor * sim, axis=-3)
            out = jnp.sum(x * w, axis=-3)
            return (out, w) if return_weight else out
        q_para = jnp.sum(q * jnp.broadcast_to(k_inv, q.shape), axis=-1)
        sel = jnp.argmax(q_para, axis=-2)
        out = jnp.take_along_axis(x, sel[..., None, :, None], axis=-3)[
            ..., 0, :, :
        ]
        return (out, None) if return_weight else out
