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


def test_knn_with_topk_scale_matches_separate_kernels():
    """Fused front-end kernel (one distance pass serving the layer-0
    graph AND the top-5 scale statistic) vs the separate kernels."""
    import numpy as np

    from livingscenes_tpu.ops.pallas_knn import (
        knn_pallas,
        knn_with_topk_scale,
    )
    from livingscenes_tpu.ops.pallas_scale import (
        top_k_mean_pairwise_distance,
    )

    rng = np.random.default_rng(3)
    for B, N in [(2, 512), (3, 200)]:
        pc = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        idx, scale = knn_with_topk_scale(pc, 16, interpret=True)
        _, idx_ref = knn_pallas(pc, pc, 16, interpret=True)
        scale_ref = top_k_mean_pairwise_distance(pc, 5, interpret=True)
        assert bool(jnp.all(idx == idx_ref)), (B, N)
        np.testing.assert_allclose(
            np.asarray(scale), np.asarray(scale_ref), rtol=1e-6
        )
        # against the raw XLA formulation (cdist -> flattened top-5 mean)
        d = jnp.sqrt(jnp.maximum(jnp.sum(
            (pc[:, :, None] - pc[:, None, :]) ** 2, -1), 0.0))
        top5 = jax.lax.top_k(d.reshape(B, -1), 5)[0]
        np.testing.assert_allclose(
            np.asarray(scale), np.asarray(top5.mean(-1)), rtol=1e-5
        )


def test_encoder_accepts_precomputed_first_knn():
    """Passing the layer-0 graph into the encoder must reproduce the
    internal kNN build bit-for-bit (the fused front end's contract)."""
    import numpy as np

    from livingscenes_tpu.models.shape_prior import (
        ShapePrior,
        ShapePriorConfig,
    )
    from livingscenes_tpu.ops.knn import knn

    cfg = ShapePriorConfig(
        c_dim=16,
        num_layers=3,
        feat_dim=(8, 8, 16),
        down_sample_layers=(2,),
        down_sample_factor=(2,),
        atten_start_layer=2,
        atten_multi_head_c=4,
        num_knn=8,
        n_pcl=64,
        approx_knn=False,
    )
    model = ShapePrior(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    out_internal = model.encoder.apply({"params": params["encoder"]}, x)
    _, idx0 = knn(
        x.reshape(2, 64, 3), x.reshape(2, 64, 3), 8, approx=False
    )
    out_pre = model.encoder.apply(
        {"params": params["encoder"]}, x, first_knn_idx=idx0
    )
    for a, b in zip(out_internal, out_pre):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
