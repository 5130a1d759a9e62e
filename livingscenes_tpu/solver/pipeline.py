"""Sharded end-to-end scene-pair pipeline — the headline inference path.

The reference processes one scene pair at a time with Python loops over
instances (More_Solver._solve_end2end, lib_more/more_solver.py:246-299) and
its only parallelism is single-host DataParallel during training
(model_base.py:221-227). Here the whole pipeline

    encode all instances of S scene pairs -> per-scene sequential matching
    -> batched Kabsch + ICP (+ optional 400-step SE(3) refinement)

is ONE XLA program whose scene axis is sharded over a `jax.sharding.Mesh`
("dp"): parameters are replicated, every device processes S/n_dev scene
pairs, and no cross-scene communication exists, so throughput scales
linearly over ICI. This is the program bench.py measures and
__graft_entry__.dryrun_multichip validates on a virtual mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .matcher import sequential_matcher
from .registration import RegistrationConfig, solve_pairwise_registration

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    optim: bool = False  # run the 400-step SE(3) refinement per pair
    registration: RegistrationConfig = RegistrationConfig()


def build_scene_pair_pipeline(
    model,
    cfg: PipelineConfig = PipelineConfig(),
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
):
    """Compile the scene-pair pipeline, optionally sharded over `mesh`.

    Returns a function (params, ref_pc, rescan_pc) -> dict with
      matches0 (S, O)   per-scene matching of ref -> rescan instances
      R (S, O, 3, 3), t (S, O, 3, 1)   registration of every ref instance
        to its matched rescan partner (unmatched rows still computed
        against partner 0; mask with matches0 >= 0).

    ref_pc / rescan_pc: (S, O, N, 3) batched scene pairs. When `mesh` is
    given, S must be divisible by the mesh size; inputs are sharded on the
    scene axis and params replicated.
    """

    def pipeline(params, ref_pc: Array, rescan_pc: Array):
        S, O, N, _ = ref_pc.shape
        flat_ref = ref_pc.reshape(S * O, N, 3)
        flat_res = rescan_pc.reshape(S * O, N, 3)
        # two encoder calls (measured marginally faster than one 2x-batch
        # call at the operating point — smaller kNN working sets)
        codes_ref = model.encode(params, flat_ref)
        codes_res = model.encode(params, flat_res)

        z_ref = codes_ref["z_inv"].reshape(S, O, -1)
        z_res = codes_res["z_inv"].reshape(S, O, -1)
        matches = jax.vmap(
            lambda a, b: sequential_matcher(a, b)["matches0"]
        )(z_ref, z_res)  # (S, O)

        partner = jnp.where(matches >= 0, matches, 0)
        flat_partner = (partner + jnp.arange(S)[:, None] * O).reshape(-1)
        pc2 = jnp.take(flat_res, flat_partner, axis=0)
        c2 = jax.tree.map(
            lambda x: jnp.take(x, flat_partner, axis=0), codes_res
        )
        R, t = solve_pairwise_registration(
            model, params, flat_ref, pc2, codes_ref, c2,
            optim=cfg.optim, cfg=cfg.registration,
        )
        return {
            "matches0": matches,
            "R": R.reshape(S, O, 3, 3),
            "t": t.reshape(S, O, 3, 1),
        }

    if mesh is None:
        return jax.jit(pipeline)

    repl = NamedSharding(mesh, P())
    scene_sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        pipeline,
        in_shardings=(repl, scene_sharded, scene_sharded),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
