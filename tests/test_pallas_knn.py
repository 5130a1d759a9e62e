"""Pallas kNN kernel vs the exact XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.ops.knn import knn
from livingscenes_tpu.ops.pallas_knn import knn_pallas


@pytest.mark.parametrize(
    "B,Nq,Np,D,K",
    [
        (2, 64, 64, 3, 8),       # xyz graph
        (1, 100, 128, 96, 16),   # feature-space graph, padded query tile
        (2, 128, 32, 24, 16),    # K > tile edge, small source
    ],
)
def test_pallas_knn_matches_exact(B, Nq, Np, D, K):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Nq, D)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(B, Np, D)), jnp.float32)
    K_eff = min(K, Np)
    d_ref, i_ref = knn(q, p, K_eff, approx=False)
    d_out, i_out = knn_pallas(q, p, K_eff, tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_out), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(d_out), np.asarray(d_ref), rtol=1e-5, atol=1e-5
    )
    # ascending order
    assert np.all(np.diff(np.asarray(d_out), axis=-1) >= 0)
