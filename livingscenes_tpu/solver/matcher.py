"""Instance matching on SIM(3)-invariant embeddings.

TPU re-design of lib_more/matcher_new.py. The reference's greedy
`sequential_matcher` (matcher_new.py:109-139) shrinks the score matrix by
deleting rows/columns in a Python loop; here it is a fixed-trip-count
`lax.fori_loop` that masks out matched rows/columns with -inf instead —
identical selection order (the reference's per-iteration max-normalization
is positive and monotone, so it never changes the argmax), but fully
jittable and vmappable over scene pairs, with padded (masked) instance sets.

All matchers return {"matches0": (S,), "matches1": (T,)} with -1 for
unmatched, exactly like the reference.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import se3
from ..ops.sinkhorn import log_optimal_transport

Array = jax.Array

_NEG = -1e30


def _l2_normalize(x: Array, axis: int = -1) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def _greedy_assign(
    score: Array,
    src_mask: Optional[Array],
    tgt_mask: Optional[Array],
) -> Dict[str, Array]:
    """Greedy mutual-best assignment by repeated global argmax + row/col
    masking (equivalent to matcher_new.py:122-137 row/col deletion)."""
    S, T = score.shape
    if src_mask is None:
        src_mask = jnp.ones((S,), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((T,), bool)
    n_iter_dyn = jnp.minimum(jnp.sum(src_mask), jnp.sum(tgt_mask))

    masked = jnp.where(src_mask[:, None] & tgt_mask[None, :], score, _NEG)

    def body(i, carry):
        masked, m0, m1 = carry
        flat = jnp.argmax(masked)
        row, col = flat // T, flat % T
        active = i < n_iter_dyn
        m0 = jnp.where(active, m0.at[row].set(col.astype(jnp.int32)), m0)
        m1 = jnp.where(active, m1.at[col].set(row.astype(jnp.int32)), m1)
        masked = jnp.where(
            active,
            masked.at[row, :].set(_NEG).at[:, col].set(_NEG),
            masked,
        )
        return masked, m0, m1

    m0 = jnp.full((S,), -1, jnp.int32)
    m1 = jnp.full((T,), -1, jnp.int32)
    _, m0, m1 = jax.lax.fori_loop(0, min(S, T), body, (masked, m0, m1))
    return {"matches0": m0, "matches1": m1}


def sequential_matcher(
    z_inv_src: Array,
    z_inv_tgt: Array,
    src_mask: Optional[Array] = None,
    tgt_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Greedy cosine-similarity matcher — the method used everywhere by the
    reference (matcher_new.py:109). z_inv_*: (S, C), (T, C)."""
    src = _l2_normalize(z_inv_src)
    tgt = _l2_normalize(z_inv_tgt)
    score = src @ tgt.T
    return _greedy_assign(score, src_mask, tgt_mask)


def _mutual_check(m0: Array, m1: Array) -> Array:
    """-1 out non-mutual matches (matcher_new.py:100-105)."""
    inds = jnp.arange(m0.shape[0])
    loop = m1[jnp.where(m0 > -1, m0, 0)]
    ok = (m0 > -1) & (inds == loop)
    return jnp.where(ok, m0, -1)


def nn_matcher(
    z_inv_src: Array,
    z_inv_tgt: Array,
    src_mask: Optional[Array] = None,
    tgt_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Mutual nearest-neighbor matcher (matcher_new.py:85-98)."""
    src = _l2_normalize(z_inv_src)
    tgt = _l2_normalize(z_inv_tgt)
    sim = src @ tgt.T
    if src_mask is not None:
        sim = jnp.where(src_mask[:, None], sim, _NEG)
    if tgt_mask is not None:
        sim = jnp.where(tgt_mask[None, :], sim, _NEG)
    m0 = jnp.argmax(sim, axis=1).astype(jnp.int32)
    m1 = jnp.argmax(sim, axis=0).astype(jnp.int32)
    if src_mask is not None:
        m0 = jnp.where(src_mask, m0, -1)
    if tgt_mask is not None:
        m1 = jnp.where(tgt_mask, m1, -1)
    m0c = _mutual_check(m0, m1)
    m1c = _mutual_check(m1, m0c)
    return {"matches0": m0c, "matches1": m1c}


def sinkhorn_matcher(
    z_inv_src: Array,
    z_inv_tgt: Array,
    desc_dim: int = 256,
    match_threshold: float = 0.0,
    iters: int = 100,
) -> Dict[str, Array]:
    """SuperGlue-style OT matcher with dustbin (matcher_new.py:45-71)."""
    src = _l2_normalize(z_inv_src)
    tgt = _l2_normalize(z_inv_tgt)
    scores = (src @ tgt.T)[None] / jnp.sqrt(jnp.asarray(desc_dim, src.dtype))
    Z = log_optimal_transport(scores, jnp.asarray(1.0, src.dtype), iters)
    core = Z[:, :-1, :-1]
    max0_val, max1_val = core.max(axis=2), core.max(axis=1)
    indices0 = jnp.argmax(core, axis=2).astype(jnp.int32)
    indices1 = jnp.argmax(core, axis=1).astype(jnp.int32)
    S, T = core.shape[1], core.shape[2]
    mutual0 = jnp.arange(S)[None] == jnp.take_along_axis(indices1, indices0, 1)
    mutual1 = jnp.arange(T)[None] == jnp.take_along_axis(indices0, indices1, 1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0_val), 0.0)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, indices1, 1), 0.0
    )
    valid0 = mutual0 & (mscores0 > match_threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, 1)
    m0 = jnp.where(valid0, indices0, -1)[0]
    m1 = jnp.where(valid1, indices1, -1)[0]
    return {"matches0": m0, "matches1": m1}


def _kabsch_residual_matrix(z_so3_src: Array, z_so3_tgt: Array) -> Array:
    """Mean Kabsch residual for every (src, tgt) pair of SO(3) features.

    The reference loops over src instances (matcher_new.py:153-155); here a
    single vmap-of-vmap produces the full (S, T) residual matrix on device.
    """

    def pair_res(a, b):
        _, _, res = se3.kabsch(a[None], b[None])
        return jnp.mean(res)

    return jax.vmap(
        lambda a: jax.vmap(lambda b: pair_res(a, b))(z_so3_tgt)
    )(z_so3_src)


def sim3_seq_matcher(
    src_codes: Dict[str, Array],
    tgt_codes: Dict[str, Array],
    src_mask: Optional[Array] = None,
    tgt_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Greedy matcher scoring cos-sim / Kabsch-residual (matcher_new.py:142)."""
    sim = _l2_normalize(src_codes["z_inv"]) @ _l2_normalize(tgt_codes["z_inv"]).T
    res = _kabsch_residual_matrix(src_codes["z_so3"], tgt_codes["z_so3"])
    score = sim / (res + 1e-5)
    return _greedy_assign(score, src_mask, tgt_mask)


def eq_seq_matcher(
    src_codes: Dict[str, Array],
    tgt_codes: Dict[str, Array],
    src_mask: Optional[Array] = None,
    tgt_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Greedy matcher scoring 1 / Kabsch-residual (matcher_new.py:188)."""
    res = _kabsch_residual_matrix(src_codes["z_so3"], tgt_codes["z_so3"])
    score = 1.0 / (res + 1e-5)
    return _greedy_assign(score, src_mask, tgt_mask)


def solve_object_matching(
    src_codes: Dict[str, Array],
    tgt_codes: Dict[str, Array],
    method: str = "sequential",
    src_mask: Optional[Array] = None,
    tgt_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Dispatch over the five matchers (lib_more/more_solver.py:71-93)."""
    if method == "sequential":
        return sequential_matcher(
            src_codes["z_inv"], tgt_codes["z_inv"], src_mask, tgt_mask
        )
    if method == "nn":
        return nn_matcher(
            src_codes["z_inv"], tgt_codes["z_inv"], src_mask, tgt_mask
        )
    if method == "sinkhorn":
        return sinkhorn_matcher(src_codes["z_inv"], tgt_codes["z_inv"])
    if method == "sim3_seq":
        return sim3_seq_matcher(src_codes, tgt_codes, src_mask, tgt_mask)
    if method == "eq_seq":
        return eq_seq_matcher(src_codes, tgt_codes, src_mask, tgt_mask)
    raise ValueError(f"unknown matching method: {method}")
