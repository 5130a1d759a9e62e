import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from livingscenes_tpu import se3
from livingscenes_tpu.ops import (
    farthest_point_sampling,
    iterative_closest_point,
    knn,
    log_optimal_transport,
    pairwise_sqdist,
    sinkhorn_divergence,
)


def test_pairwise_sqdist_matches_numpy(rng):
    a = rng.normal(size=(2, 17, 3))
    b = rng.normal(size=(2, 23, 3))
    d = pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    expected = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, atol=1e-10)


def test_knn_matches_bruteforce(rng):
    q = rng.normal(size=(2, 31, 3))
    p = rng.normal(size=(2, 57, 3))
    d, idx = knn(jnp.asarray(q), jnp.asarray(p), k=5)
    full = ((q[:, :, None] - p[:, None]) ** 2).sum(-1)
    expected_idx = np.argsort(full, axis=-1)[..., :5]
    np.testing.assert_array_equal(idx, expected_idx)
    np.testing.assert_allclose(
        d, np.take_along_axis(full, expected_idx, axis=-1), atol=1e-10
    )


def test_knn_respects_points_mask(rng):
    p = rng.normal(size=(1, 20, 3))
    q = p[:, :4]
    mask = np.ones((1, 20), bool)
    mask[:, 10:] = False
    _, idx = knn(jnp.asarray(q), jnp.asarray(p), k=6, points_mask=jnp.asarray(mask))
    assert int(np.max(np.asarray(idx))) < 10


def test_fps_first_index_and_spread(rng):
    pts = rng.normal(size=(2, 128, 3))
    sampled, idx = farthest_point_sampling(jnp.asarray(pts), 16)
    assert idx.shape == (2, 16)
    assert np.all(np.asarray(idx)[:, 0] == 0)
    # all indices distinct
    for b in range(2):
        assert len(set(np.asarray(idx)[b].tolist())) == 16
    # fps spreads better than the first-k prefix
    def min_pairwise(x):
        d = ((x[:, None] - x[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    for b in range(2):
        assert min_pairwise(np.asarray(sampled)[b]) >= min_pairwise(pts[b, :16])


def test_fps_mask_excludes_padding(rng):
    pts = rng.normal(size=(1, 64, 3))
    pts[:, 40:] = 100.0  # padding garbage far away — would dominate FPS
    mask = np.ones((1, 64), bool)
    mask[:, 40:] = False
    _, idx = farthest_point_sampling(jnp.asarray(pts), 10, mask=jnp.asarray(mask))
    assert int(np.max(np.asarray(idx))) < 40


def test_fps_matches_greedy_reference(rng):
    """Cross-check against an independent O(N^2) numpy greedy FPS."""
    pts = rng.normal(size=(1, 50, 3))
    _, idx = farthest_point_sampling(jnp.asarray(pts), 8)
    x = pts[0]
    chosen = [0]
    mind = ((x - x[0]) ** 2).sum(-1)
    for _ in range(7):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((x - x[nxt]) ** 2).sum(-1))
    np.testing.assert_array_equal(np.asarray(idx)[0], chosen)


def test_icp_recovers_small_transform(rng):
    R = Rotation.from_euler("xyz", [4, -3, 5], degrees=True).as_matrix()
    t = np.array([0.05, -0.02, 0.03])
    src = rng.normal(size=(1, 256, 3))
    tgt = src @ R.T + t
    res = iterative_closest_point(
        jnp.asarray(src), jnp.asarray(tgt), max_iterations=30
    )
    np.testing.assert_allclose(res.R[0], R, atol=1e-5)
    np.testing.assert_allclose(res.t[0], t, atol=1e-5)
    assert float(res.rmse[0]) < 1e-5


def test_log_optimal_transport_is_doubly_stochastic(rng):
    scores = jnp.asarray(rng.normal(size=(1, 5, 7)))
    Z = log_optimal_transport(scores, jnp.asarray(1.0), iters=200)
    P = np.exp(np.asarray(Z)) / (5 + 7)
    # rows of the augmented coupling sum to marginals
    np.testing.assert_allclose(P[0, :-1].sum(-1), np.full(5, 1.0 / 12), rtol=1e-3)
    np.testing.assert_allclose(P[0, :, :-1].sum(0), np.full(7, 1.0 / 12), rtol=1e-3)


def test_sinkhorn_divergence_properties(rng):
    x = jnp.asarray(rng.normal(size=(64, 3)) * 0.3)
    y = jnp.asarray(rng.normal(size=(64, 3)) * 0.3 + 0.5)
    d_xy = sinkhorn_divergence(x, y)
    d_xx = sinkhorn_divergence(x, x)
    assert float(d_xx) < 1e-6  # debiased: S(x, x) = 0
    assert float(d_xy) > float(d_xx)
    # differentiable and pulls x toward y
    g = jax.grad(lambda x_: sinkhorn_divergence(x_, y).sum())(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    # gradient descent step reduces divergence
    x2 = x - 0.5 * g
    assert float(sinkhorn_divergence(x2, y)) < float(d_xy)


def test_sinkhorn_divergence_batched(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 3)))
    y = jnp.asarray(rng.normal(size=(2, 32, 3)))
    d = sinkhorn_divergence(x, y)
    assert d.shape == (2,)


def test_gather_neighbors_onehot_matches_native(rng):
    from livingscenes_tpu.ops.knn import gather_neighbors, gather_neighbors_onehot

    feats = jnp.asarray(rng.normal(size=(3, 40, 24)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 40, size=(3, 17, 5)), jnp.int32)
    a = gather_neighbors(feats, idx)
    b = gather_neighbors_onehot(feats, idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_fps_interpret_matches_xla(rng):
    from livingscenes_tpu.ops.pallas_fps import fps_pallas

    pts = jnp.asarray(rng.normal(size=(8, 64, 3)), jnp.float32)
    _, i_ref = farthest_point_sampling(pts, 16)
    _, i_pl = fps_pallas(pts, 16, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    mask = jnp.ones((8, 64), bool).at[:, 48:].set(False)
    _, mi = fps_pallas(pts, 8, mask, interpret=True)
    assert int(np.asarray(mi).max()) < 48


def test_pallas_fps_batch_tile_invariant(rng):
    """Selection is per-batch-row, so the batch tile (a pure scheduling
    knob, swept on-chip via LSTPU_FPS_TILE) must not change results."""
    from livingscenes_tpu.ops.pallas_fps import fps_pallas

    pts = jnp.asarray(rng.normal(size=(16, 128, 3)), jnp.float32)
    _, i_ref = farthest_point_sampling(pts, 32)
    for tile in (8, 16):
        _, i_pl = fps_pallas(pts, 32, batch_tile=tile, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))

def test_pallas_fps_unroll_invariant_ties_and_tail(rng):
    """The manual unroll factor is a pure scheduling knob: results must
    be bit-equal to the XLA FPS for every unroll, including when (k-1)
    is not a multiple of the unroll (surplus rounds in the last trip
    write idx columns >= k), on tie-heavy integer-grid data with
    duplicated points (exact distance ties), and when fewer valid points
    than k exist (the tail must repeat already-selected points exactly
    like ops/fps.py)."""
    from livingscenes_tpu.ops.pallas_fps import fps_pallas

    pts = jnp.asarray(rng.normal(size=(8, 256, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((8, 256)) > 0.2)
    for k in (64, 65):
        _, i_ref = farthest_point_sampling(pts, k, mask=mask)
        for unroll in (1, 4, 8):
            _, i_pl = fps_pallas(
                pts, k, mask, batch_tile=4, interpret=True, unroll=unroll
            )
            np.testing.assert_array_equal(
                np.asarray(i_pl), np.asarray(i_ref)
            )

    # exact ties: integer lattice + duplicated points
    g = np.stack(
        np.meshgrid(np.arange(4), np.arange(4), np.arange(4),
                    indexing="ij"),
        -1,
    ).reshape(-1, 3).astype(np.float32)
    g = np.concatenate([g, g[:32]], 0)[None].repeat(8, 0)
    gp = jnp.asarray(g)
    _, i_ref = farthest_point_sampling(gp, 48)
    _, i_pl = fps_pallas(gp, 48, batch_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))

    # tail: only 20 valid points, k = 64
    m2 = jnp.asarray(np.arange(256)[None, :].repeat(8, 0) < 20)
    _, i_ref = farthest_point_sampling(pts, 64, mask=m2)
    _, i_pl = fps_pallas(pts, 64, m2, batch_tile=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
