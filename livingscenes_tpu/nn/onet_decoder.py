"""OccNet decoder family (alternatives to DeepSDF).

TPU re-design of the reference's onet_decoder.py:
* `ResnetBlockFC`      — fully-connected residual block (:7-49).
* `Decoder`            — latent + point MLP decoder (:207-279).
* `DecoderCBatchNorm`  — conditional-batch-norm decoder (:325-409); the
  conditioning is implemented as conditional *layer* scaling (gamma/beta
  predicted from the code) — the reference's CBatchNorm collapses to this
  per-sample affine at inference and batch statistics would break
  jit/vmap purity.
`DecoderCat` (the `inner`/`inv_mlp` type) lives in nn/deepsdf.py.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ResnetBlockFC(nn.Module):
    size_out: int
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)
        net = nn.Dense(size_h, name="fc_0")(jax.nn.relu(x))
        dx = nn.Dense(
            self.size_out,
            name="fc_1",
            kernel_init=nn.initializers.zeros,
        )(jax.nn.relu(net))
        if size_in == self.size_out:
            x_s = x
        else:
            x_s = nn.Dense(self.size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class Decoder(nn.Module):
    """Decoder with latent injection by addition (onet_decoder.py:207)."""

    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5

    @nn.compact
    def __call__(self, p: Array, c: Array) -> Array:
        """p: (B, M, dim) query features; c: (B, c_dim) codes -> (B, M)."""
        h = nn.Dense(self.hidden_size, name="fc_p")(p)
        for i in range(self.n_blocks):
            if self.c_dim > 0:
                h = h + nn.Dense(self.hidden_size, name=f"fc_c{i}")(c)[:, None]
            h = ResnetBlockFC(self.hidden_size, name=f"block{i}")(h)
        out = nn.Dense(1, name="fc_out")(jax.nn.relu(h))
        return out[..., 0]


class CondScale(nn.Module):
    """Per-sample conditional affine (gamma, beta from the code) — the
    jit-pure stand-in for CBatchNorm1d (onet_decoder.py:108-158)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        gamma = nn.Dense(
            self.features, name="conv_gamma",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
        )(c)
        beta = nn.Dense(
            self.features, name="conv_beta",
            kernel_init=nn.initializers.zeros,
        )(c)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return gamma[:, None] * xn + beta[:, None]


class CResnetBlockConv1d(nn.Module):
    """Conditional residual block (onet_decoder.py:52-105)."""

    size_out: int
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)
        net = CondScale(size_in, name="bn_0")(x, c)
        net = nn.Dense(size_h, name="fc_0")(jax.nn.relu(net))
        net = CondScale(size_h, name="bn_1")(net, c)
        dx = nn.Dense(
            self.size_out, name="fc_1", kernel_init=nn.initializers.zeros
        )(jax.nn.relu(net))
        if size_in == self.size_out:
            x_s = x
        else:
            x_s = nn.Dense(self.size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class DecoderCBatchNorm(nn.Module):
    """Conditioned decoder (onet_decoder.py:325-409)."""

    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5

    @nn.compact
    def __call__(self, p: Array, c: Array) -> Array:
        h = nn.Dense(self.hidden_size, name="fc_p")(p)
        for i in range(self.n_blocks):
            h = CResnetBlockConv1d(self.hidden_size, name=f"block{i}")(h, c)
        h = CondScale(self.hidden_size, name="bn_out")(h, c)
        out = nn.Dense(1, name="fc_out")(jax.nn.relu(h))
        return out[..., 0]
