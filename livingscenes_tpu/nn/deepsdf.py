"""Implicit-field decoders.

* `DeepSDFDecoder` — the production decoder (`inner_deepsdf` type,
  lib_shape_prior/core/lib/implicit_func/deepsdf_decoder.py:9-123): an
  8 x 768 weight-normalized MLP with latent re-injection at layer 4,
  per-layer dropout and a final tanh. The invariant query
  [<q, z_so3> (256) | ||q|| (1)] concatenated with z_inv (256) is the input
  (pe_dim = 257, latent = 256 -> 513 input features).
* `DecoderCat` — plain concat-MLP decoder used by the `inner` / `inv_mlp`
  decoder types (onet_decoder.py:282-322).

Both are stateless flax modules whose matmuls batch over all query points —
the hot path of SDF grid evaluation, mesh extraction, and registration
refinement.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class WNDense(nn.Module):
    """Dense layer with weight normalization (torch nn.utils.weight_norm,
    dim=0): W = g * v / ||v||_row, matching deepsdf_decoder.py:52-58."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]

        def v_init(key, shape, dtype=jnp.float32):
            # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
            # U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
            bound = 1.0 / jnp.sqrt(shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        v = self.param("v", v_init, (in_features, self.features))
        # torch stores (out, in) and normalizes per-out-row; our v is
        # (in, out) so normalize per column.
        v_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        # torch weight_norm initializes g = ||v||_row so the effective
        # matrix at init equals the underlying Linear's init — matching
        # from-scratch training dynamics (nn.utils.weight_norm semantics).
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v, axis=0).astype(v.dtype),
            (self.features,),
        )

        def b_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(in_features)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        b = self.param("b", b_init, (self.features,))
        w = v * (g[None, :] / jnp.maximum(v_norm, 1e-12))
        return x @ w + b


class DeepSDFDecoder(nn.Module):
    """DeepSDF MLP; defaults match configs/3rscan/dgcnn_attn_inner.yaml:46-56."""

    latent_size: int = 256
    dims: Sequence[int] = (768,) * 8
    dropout: Sequence[int] = tuple(range(8))
    dropout_prob: float = 0.2
    norm_layers: Sequence[int] = tuple(range(8))
    latent_in: Sequence[int] = (4,)
    weight_norm: bool = True
    use_tanh: bool = False
    latent_dropout: bool = False
    pe_dim: int = 257

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: (..., latent_size + pe_dim) -> (...,) sdf values."""
        dims = [self.latent_size + self.pe_dim] + list(self.dims) + [1]
        num_layers = len(dims)
        inp = x

        h = x
        for layer in range(num_layers - 1):
            if layer + 1 in self.latent_in:
                out_dim = dims[layer + 1] - dims[0]
            else:
                out_dim = dims[layer + 1]
            if layer in self.latent_in:
                h = jnp.concatenate([h, inp], axis=-1)
            if self.weight_norm and layer in self.norm_layers:
                h = WNDense(out_dim, name=f"lin{layer}")(h)
            else:
                h = nn.Dense(out_dim, name=f"lin{layer}")(h)
            if layer == num_layers - 2 and self.use_tanh:
                h = jnp.tanh(h)
            if layer < num_layers - 2:
                h = jax.nn.relu(h)
                if layer in self.dropout:
                    h = nn.Dropout(rate=self.dropout_prob, deterministic=not train)(h)
        # The reference applies a final tanh unconditionally
        # (deepsdf_decoder.py:75,120-121).
        h = jnp.tanh(h)
        return h[..., 0]


class DecoderCat(nn.Module):
    """Concat-input MLP decoder (onet_decoder.py DecoderCat), used by the
    `inner` and `inv_mlp` decoder types."""

    input_dim: int = 513
    hidden_size: int = 512
    n_blocks: int = 5
    leaky: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = (
            (lambda v: jax.nn.leaky_relu(v, 0.2)) if self.leaky else jax.nn.relu
        )
        h = nn.Dense(self.hidden_size, name="fc_in")(x)
        for i in range(self.n_blocks):
            dx = nn.Dense(self.hidden_size, name=f"block{i}_fc0")(act(h))
            dx = nn.Dense(self.hidden_size, name=f"block{i}_fc1")(act(dx))
            h = h + dx
        out = nn.Dense(1, name="fc_out")(act(h))
        return out[..., 0]
