"""Multi-scan joint optimization.

The capability behind BASELINE config 3 ("FlyingShape multi-scan sequence:
joint optimization + point-cloud accumulation across T scans") and the
reference's multi-scan latent refinement story (SURVEY.md §0): instances
matched across T scans are registered into the reference frame, their
observations accumulated, and a single code per object is optimized against
the union of its observations — one batched `optimize_codes` call over all
objects instead of per-scan Python loops.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import se3
from ..ops.fps import farthest_point_sampling
from .code_optim import CodeOptimConfig, optimize_codes

Array = jax.Array
Codes = Dict[str, Array]


@dataclasses.dataclass
class JointResult:
    codes: Codes  # optimized per-reference-instance codes
    accumulated_pc: Array  # (S, T*N, 3) observations in the ref frame
    accumulated_mask: Array  # (S, T*N)
    matches: List[np.ndarray]  # per rescan: matches0 into that rescan
    transforms: List[Array]  # per rescan: (S, 4, 4) ref -> rescan


def accumulate_and_optimize(
    solver,
    scans: Sequence[Tuple[Array, Optional[Array]]],
    optim_registration: bool = False,
    code_cfg: Optional[CodeOptimConfig] = None,
) -> JointResult:
    """Joint multi-scan pipeline.

    Args:
      solver: a MoreSolver.
      scans: [(pc (S_t, N, 3), mask (S_t, N) or None), ...]; scans[0] is
        the reference scan.
    """
    ref_pc, ref_mask = scans[0]
    k = solver.cfg.n_input_point
    ref_in, _ = farthest_point_sampling(ref_pc, k, mask=ref_mask)
    ref_codes = solver.encode_instances(ref_in)
    S = ref_pc.shape[0]

    obs_pc = [ref_pc]
    obs_mask = [
        ref_mask
        if ref_mask is not None
        else jnp.ones(ref_pc.shape[:2], bool)
    ]
    matches_out: List[np.ndarray] = []
    transforms_out: List[Array] = []

    for pc_t, mask_t in scans[1:]:
        in_t, _ = farthest_point_sampling(pc_t, k, mask=mask_t)
        codes_t = solver.encode_instances(in_t)
        matches = solver.solve_object_matching(ref_codes, codes_t)
        m0 = matches["matches0"]
        partner = jnp.where(m0 >= 0, m0, 0)

        pc2 = jnp.take(in_t, partner, axis=0)
        c2 = jax.tree.map(lambda x: jnp.take(x, partner, axis=0), codes_t)
        R, t = solver.solve_pairwise_registration(
            ref_in, pc2, optim=optim_registration,
            codes1=ref_codes, codes2=c2,
        )
        tsfm = se3.rt_to_se3(R, t)  # ref -> rescan per matched ref instance
        inv = se3.inverse(tsfm)

        # Bring the rescan observations of each matched object into the
        # reference frame; unmatched rows contribute only masked-out points.
        full2 = jnp.take(pc_t, partner, axis=0)
        full2_mask = (
            jnp.take(mask_t, partner, axis=0)
            if mask_t is not None
            else jnp.ones(full2.shape[:2], bool)
        )
        moved = se3.transform(inv, full2)
        valid = (m0 >= 0)[:, None] & full2_mask
        obs_pc.append(moved)
        obs_mask.append(valid)
        matches_out.append(np.asarray(m0))
        transforms_out.append(tsfm)

    acc_pc = jnp.concatenate(obs_pc, axis=1)
    acc_mask = jnp.concatenate(obs_mask, axis=1)

    # Joint latent refinement on the accumulated evidence.
    fused_in, _ = farthest_point_sampling(acc_pc, k, mask=acc_mask)
    decode = lambda q, c: solver.model.decode_sdf(solver.params, q, c)
    best = optimize_codes(
        decode, ref_codes, fused_in, code_cfg or solver.cfg.code_optim
    )
    return JointResult(
        codes=best,
        accumulated_pc=acc_pc,
        accumulated_mask=acc_mask,
        matches=matches_out,
        transforms=transforms_out,
    )
