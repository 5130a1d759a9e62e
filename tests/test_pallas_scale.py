"""Pallas top-5 pairwise-distance statistic vs the XLA path
(model_utils.py:175-177 semantics: top-k over the FULL flattened matrix,
symmetric duplicates included)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.ops.pallas_scale import top_k_mean_pairwise_distance


@pytest.mark.parametrize("B,N", [(2, 64), (3, 100), (8, 64)])
def test_matches_xla_topk(B, N):
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    d2 = jnp.sum(
        (pc[:, :, None, :] - pc[:, None, :, :]) ** 2, axis=-1
    )
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    top5, _ = jax.lax.top_k(d.reshape(B, -1), 5)
    ref = jnp.mean(top5, axis=-1)
    out = top_k_mean_pairwise_distance(pc, 5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5
    )


def test_symmetric_duplicates_included():
    """The reference statistic double-counts each unordered pair; with 3
    distinct points the top-5 must be [dmax, dmax, d2, d2, d3]."""
    pc = jnp.asarray(
        [[[0.0, 0, 0], [3.0, 0, 0], [0.0, 1.0, 0]]], jnp.float32
    )
    # distances: 3 (x2), sqrt(10) (x2), 1 (x2) -> top5 mean
    d1, d2_, d3 = np.sqrt(10.0), 3.0, 1.0
    expected = (2 * d1 + 2 * d2_ + d3) / 5
    out = float(top_k_mean_pairwise_distance(pc, 5, interpret=True)[0])
    np.testing.assert_allclose(out, expected, rtol=1e-6)
