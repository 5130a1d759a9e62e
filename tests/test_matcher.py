import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.solver.matcher import (
    eq_seq_matcher,
    nn_matcher,
    sequential_matcher,
    sim3_seq_matcher,
    sinkhorn_matcher,
    solve_object_matching,
)


def make_embeddings(rng, n_src, n_tgt, dim=32, perm=None, noise=0.01):
    """tgt = permuted noisy copy of src."""
    src = rng.normal(size=(n_src, dim))
    if perm is None:
        perm = rng.permutation(min(n_src, n_tgt))
    tgt = src[perm] + noise * rng.normal(size=(len(perm), dim))
    return jnp.asarray(src), jnp.asarray(tgt), perm


def assert_perm_recovered(matches0, perm):
    m0 = np.asarray(matches0)
    for tgt_idx, src_idx in enumerate(perm):
        assert m0[src_idx] == tgt_idx, (m0, perm)


def test_sequential_matcher_recovers_permutation(rng):
    src, tgt, perm = make_embeddings(rng, 8, 8)
    out = sequential_matcher(src, tgt)
    assert_perm_recovered(out["matches0"], perm)


def test_sequential_matcher_rectangular(rng):
    src, tgt, perm = make_embeddings(rng, 10, 6, perm=np.array([0, 2, 4, 6, 8, 9]))
    out = sequential_matcher(src, tgt)
    assert_perm_recovered(out["matches0"], perm)
    # unmatched src entries are -1
    m0 = np.asarray(out["matches0"])
    assert (m0 == -1).sum() == 4


def test_sequential_matcher_masked_padding(rng):
    src, tgt, perm = make_embeddings(rng, 6, 6)
    # pad both sides with garbage + masks
    src_pad = jnp.concatenate([src, jnp.full((3, 32), 7.7)], axis=0)
    tgt_pad = jnp.concatenate([tgt, jnp.full((2, 32), 7.7)], axis=0)
    src_mask = jnp.arange(9) < 6
    tgt_mask = jnp.arange(8) < 6
    out = sequential_matcher(src_pad, tgt_pad, src_mask, tgt_mask)
    assert_perm_recovered(out["matches0"][:6], perm)
    assert np.all(np.asarray(out["matches0"][6:]) == -1)
    assert np.all(np.asarray(out["matches1"][6:]) == -1)


def test_sequential_matcher_greedy_order_matches_reference_semantics(rng):
    """Independent numpy greedy (repeated global max + delete) must agree."""
    src, tgt, _ = make_embeddings(rng, 7, 5, perm=np.arange(5), noise=0.8)
    out = sequential_matcher(src, tgt)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    score = norm(np.asarray(src)) @ norm(np.asarray(tgt)).T
    m0 = -np.ones(7, int)
    sc = score.copy()
    for _ in range(5):
        r, c = np.unravel_index(np.argmax(sc), sc.shape)
        m0[r] = c
        sc[r, :] = -np.inf
        sc[:, c] = -np.inf
    np.testing.assert_array_equal(np.asarray(out["matches0"]), m0)


def test_nn_matcher_mutual_only(rng):
    src, tgt, perm = make_embeddings(rng, 6, 6)
    out = nn_matcher(src, tgt)
    assert_perm_recovered(out["matches0"], perm)


def test_sinkhorn_matcher(rng):
    src, tgt, perm = make_embeddings(rng, 6, 6, noise=0.001)
    out = sinkhorn_matcher(src, tgt, desc_dim=32)
    assert_perm_recovered(out["matches0"], perm)


def _codes_from_so3(rng, z_so3_src, z_so3_tgt):
    return (
        {
            "z_inv": jnp.asarray(rng.normal(size=(z_so3_src.shape[0], 16))),
            "z_so3": z_so3_src,
        },
        {
            "z_inv": jnp.asarray(rng.normal(size=(z_so3_tgt.shape[0], 16))),
            "z_so3": z_so3_tgt,
        },
    )


def test_eq_seq_matcher_uses_so3_residual(rng):
    """Objects whose z_so3 differ only by rotation have ~zero Kabsch
    residual -> matched first by eq_seq."""
    from scipy.spatial.transform import Rotation

    n = 5
    base = rng.normal(size=(n, 24, 3))
    Rm = Rotation.random(n, random_state=3).as_matrix()
    rotated = np.einsum("bij,bnj->bni", Rm, base)
    perm = rng.permutation(n)
    src_codes, tgt_codes = _codes_from_so3(
        rng, jnp.asarray(base), jnp.asarray(rotated[perm])
    )
    out = eq_seq_matcher(src_codes, tgt_codes)
    m0 = np.asarray(out["matches0"])
    inv_perm = np.argsort(perm)
    for src_idx in range(n):
        assert m0[src_idx] == inv_perm[src_idx]


def test_sim3_seq_matcher_runs(rng):
    base = rng.normal(size=(4, 24, 3))
    src_codes, tgt_codes = _codes_from_so3(
        rng, jnp.asarray(base), jnp.asarray(base)
    )
    out = sim3_seq_matcher(src_codes, tgt_codes)
    assert out["matches0"].shape == (4,)


def test_dispatch(rng):
    src, tgt, perm = make_embeddings(rng, 4, 4)
    out = solve_object_matching(
        {"z_inv": src}, {"z_inv": tgt}, method="sequential"
    )
    assert_perm_recovered(out["matches0"], perm)
    with pytest.raises(ValueError):
        solve_object_matching({"z_inv": src}, {"z_inv": tgt}, method="nope")


def test_sequential_matcher_jits(rng):
    src, tgt, perm = make_embeddings(rng, 5, 5)
    out = jax.jit(sequential_matcher)(src, tgt)
    assert_perm_recovered(out["matches0"], perm)
