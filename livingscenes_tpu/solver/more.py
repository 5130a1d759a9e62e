"""MORE solver: scene-level orchestration of matching, relocalization and
reconstruction.

The public API mirrors More_Solver (lib_more/more_solver.py:25-299) so
reference users can switch over, but every per-instance / per-pair Python
loop is replaced by batched on-device computation:

  encode all instances of both scans at once -> match -> register ALL
  matched pairs in one vmapped solve -> transport codes -> extract meshes
  (device grids batched, host isosurface per instance).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import se3
from ..models.shape_prior import (
    ShapePrior,
    slice_codes,
    transform_codes,
)
from ..ops.fps import farthest_point_sampling
from ..recon.extractor import MeshExtractor, MeshExtractorConfig
from ..recon.mesh import Mesh
from .code_optim import CodeOptimConfig, optimize_codes
from .matcher import solve_object_matching
from .registration import RegistrationConfig, solve_pairwise_registration

Array = jax.Array
Codes = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class MoreSolverConfig:
    n_input_point: int = 1024  # shape_priors.n_input_point
    # FPS restarts per registration pair (configs/more_3rscan.yaml:10,
    # more_solver.py:107). The reference replicates each pair n_init times
    # through FPS (a no-op there: pytorch3d FPS is deterministic without
    # random starts); here restarts use random start points and the
    # lowest-Kabsch-residual candidate wins.
    n_init: int = 1
    seed: int = 0  # base seed for the n_init random FPS restarts
    registration: RegistrationConfig = RegistrationConfig()
    mesh_extractor: MeshExtractorConfig = MeshExtractorConfig()
    code_optim: CodeOptimConfig = CodeOptimConfig()
    matching_method: str = "sequential"


class MoreSolver:
    """Task orchestration over a shape prior (params applied functionally)."""

    def __init__(
        self,
        model: ShapePrior,
        params,
        config: MoreSolverConfig = MoreSolverConfig(),
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh — reconstruction grid
        queries are sharded over its devices (query-point sharding,
        SURVEY §2.7)."""
        self.model = model
        self.params = params
        self.cfg = config
        self._restart_calls = 0  # advances the n_init restart rng per call
        self.mesh_extractor = MeshExtractor(
            lambda q, c: model.occupancy_logits(params, q, c),
            config.mesh_extractor,
            mesh=mesh,
        )
        self._encode = jax.jit(lambda pc: model.encode(params, pc))
        self._encode_fps = jax.jit(
            lambda pc, mask: model.encode_fps(params, pc, mask)
        )
        self._register = jax.jit(
            lambda pc1, pc2, c1, c2: solve_pairwise_registration(
                model, params, pc1, pc2, c1, c2,
                optim=False, cfg=config.registration,
            )
        )
        self._register_optim = jax.jit(
            lambda pc1, pc2, c1, c2: solve_pairwise_registration(
                model, params, pc1, pc2, c1, c2,
                optim=True, cfg=config.registration,
            )
        )

    # ------------------------------------------------------------------
    def encode_instances(
        self, pc: Array, mask: Optional[Array] = None
    ) -> Codes:
        """Encode padded per-instance clouds (B, N, 3) [+ mask (B, N)]."""
        if mask is None:
            return self._encode(pc)
        return self._encode_fps(pc, mask)

    def solve_object_matching(
        self, src_codes: Codes, tgt_codes: Codes, method: Optional[str] = None,
        src_mask=None, tgt_mask=None,
    ):
        """Instance matching (more_solver.py:71-93)."""
        return solve_object_matching(
            src_codes, tgt_codes, method or self.cfg.matching_method,
            src_mask, tgt_mask,
        )

    def solve_pairwise_registration(
        self, pc1: Array, pc2: Array, optim: bool = False,
        codes1: Optional[Codes] = None, codes2: Optional[Codes] = None,
        rng: Optional[Array] = None,
    ):
        """Registration pc1 -> pc2 on (B, N, 3) batches of pairs
        (more_solver.py:95-189). Returns (R (B,3,3), t (B,3,1)).

        With n_init > 1, each pair gets n_init random-start FPS restarts
        and the lowest-Kabsch-residual candidate wins — regardless of the
        input point count (the reference replicates pairs through FPS
        unconditionally, more_solver.py:107-108). Pass `rng` for
        reproducible-but-distinct restarts; by default the key advances
        with an internal call counter off cfg.seed.
        """
        k = self.cfg.n_input_point
        if self.cfg.n_init > 1:
            if rng is None:
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.seed), self._restart_calls
                )
                self._restart_calls += 1
            pc1, pc2, codes1, codes2 = self._best_fps_restart(pc1, pc2, rng)
        if pc1.shape[1] != k:
            pc1, _ = farthest_point_sampling(pc1, k)
        if pc2.shape[1] != k:
            pc2, _ = farthest_point_sampling(pc2, k)
        if codes1 is None:
            codes1 = self._encode(pc1)
        if codes2 is None:
            codes2 = self._encode(pc2)
        fn = self._register_optim if optim else self._register
        return fn(pc1, pc2, codes1, codes2)

    def _best_fps_restart(self, pc1: Array, pc2: Array, rng: Array):
        """n_init FPS restarts per pair (random start points); keep the
        candidate whose Kabsch init has the lowest residual."""
        from .registration import kabsch_from_codes

        k = self.cfg.n_input_point
        n = self.cfg.n_init
        B = pc1.shape[0]
        starts = jax.random.randint(
            rng, (n, B), 0, min(pc1.shape[1], pc2.shape[1])
        )

        def one(start):
            s1, _ = farthest_point_sampling(pc1, k, start_idx=start)
            s2, _ = farthest_point_sampling(pc2, k, start_idx=start)
            c1 = self._encode(s1)
            c2 = self._encode(s2)
            res = kabsch_from_codes(c1, c2).residual  # (B,)
            return s1, s2, c1, c2, res

        cands = [one(starts[i]) for i in range(n)]
        res = jnp.stack([c[4] for c in cands])  # (n, B)
        best = jnp.argmin(res, axis=0)  # (B,)

        def pick(xs):
            stacked = jnp.stack(xs)  # (n, B, ...)
            return jnp.take_along_axis(
                stacked,
                best.reshape((1, B) + (1,) * (stacked.ndim - 2)),
                axis=0,
            )[0]

        pc1_b = pick([c[0] for c in cands])
        pc2_b = pick([c[1] for c in cands])
        codes1 = jax.tree.map(lambda *xs: pick(list(xs)), *[c[2] for c in cands])
        codes2 = jax.tree.map(lambda *xs: pick(list(xs)), *[c[3] for c in cands])
        return pc1_b, pc2_b, codes1, codes2

    def optimize_code(self, codes: Codes, pc: Array, mask=None) -> Codes:
        """Latent refinement against observed points (more_solver.py:191-228)."""
        k = self.cfg.n_input_point
        pc_in, _ = farthest_point_sampling(pc, k, mask=mask)
        decode = lambda q, c: self.model.decode_sdf(self.params, q, c)
        return optimize_codes(decode, codes, pc_in, self.cfg.code_optim)

    def transform_latent(self, codes: Codes, tsfm: Array) -> Codes:
        """Equivariant code transport (more_solver.py:230-244)."""
        return transform_codes(codes, tsfm)

    def mesh_from_latent(self, codes: Codes) -> Mesh:
        """Mesh a single instance's codes (more_solver.py:37-58)."""
        return self.mesh_extractor.generate_from_codes(codes)

    def mesh_from_pc(self, pc: Array) -> Mesh:
        """FPS -> encode -> mesh (more_solver.py:60-69)."""
        pc_in, _ = farthest_point_sampling(pc, self.cfg.n_input_point)
        codes = self._encode(pc_in)
        return self.mesh_from_latent(slice_codes(codes, 0))

    # ------------------------------------------------------------------
    def solve_end2end(
        self,
        ref_pc: Array,
        ref_mask: Optional[Array],
        rescan_pc: Array,
        rescan_mask: Optional[Array],
        optim: bool = False,
        extract_meshes: bool = True,
    ) -> dict:
        """Full scene pair pipeline (more_solver.py:246-299), batched.

        ref_pc/rescan_pc: (S, N, 3) / (T, N, 3) padded per-instance clouds
        with validity masks. Returns dict with matches, per-instance SE(3)
        registrations (identity rows for unmatched), transported codes and
        (optionally) meshes in the reference frame.
        """
        k = self.cfg.n_input_point
        ref_in, _ = farthest_point_sampling(ref_pc, k, mask=ref_mask)
        rescan_in, _ = farthest_point_sampling(rescan_pc, k, mask=rescan_mask)
        ref_codes = self._encode(ref_in)
        rescan_codes = self._encode(rescan_in)

        matches = self.solve_object_matching(ref_codes, rescan_codes)
        m0 = matches["matches0"]  # (S,)
        S = int(m0.shape[0])

        # Gather the matched rescan partner for every ref instance (dummy 0
        # for unmatched; masked out afterwards) and register ALL pairs in
        # one batched call.
        partner = jnp.where(m0 >= 0, m0, 0)
        pc2 = jnp.take(rescan_in, partner, axis=0)
        codes2 = jax.tree.map(lambda x: jnp.take(x, partner, axis=0), rescan_codes)
        R, t = self.solve_pairwise_registration(
            ref_in, pc2, optim=optim, codes1=ref_codes, codes2=codes2
        )
        matched = m0 >= 0
        eyeR = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
        R = jnp.where(matched[:, None, None], R, eyeR)
        t = jnp.where(matched[:, None, None], t, jnp.zeros_like(t))
        tsfm = se3.rt_to_se3(R, t)  # ref -> rescan per matched instance

        # Transport each matched rescan code into the ref frame
        # (more_solver.py:287-294: tsfm^{-1} applied to the rescan code).
        inv = se3.inverse(tsfm)
        transported = transform_codes(codes2, inv)

        out = {
            "matches0": m0,
            "matches1": matches["matches1"],
            "registration": tsfm,
            "ref_codes": ref_codes,
            "rescan_codes": rescan_codes,
            "transported_codes": transported,
        }
        if extract_meshes:
            meshes: List[Optional[Mesh]] = []
            m0_np = np.asarray(m0)
            for i in range(S):
                if m0_np[i] < 0:
                    meshes.append(None)
                else:
                    meshes.append(
                        self.mesh_from_latent(slice_codes(transported, i))
                    )
            out["mesh_list"] = meshes
        return out
