"""Pairwise rigid registration from equivariant codes.

TPU re-design of More_Solver._solve_pairwise_registration
(lib_more/more_solver.py:95-189):

1. Closed-form init: weighted Kabsch on the (z_so3 + t) correspondence
   points of the two codes (more_solver.py:114-116).
2. Optional refinement: Adam on a 6-dof se(3) tangent parameter xi with
   g = exp(xi) o g_init (replacing torchlie's manifold Adam on a LieTensor —
   same manifold optimization, chart fixed at the init). The loss is
   SmoothL1(SDF(g . src)) + SinkhornDivergence(g . src, tgt)
   (more_solver.py:150-171), with the reference's LR schedule
   (0.05, x0.1 at {300, 340, 380}), best-loss tracking, and early stop once
   rotation drifts > 10 deg from the init — implemented as a masked freeze
   so the 400-step loop is a fixed-shape `lax.scan`.
3. Final fixed-iteration ICP refinement (more_solver.py:182-188).

Everything is jittable and vmaps over pairs; the per-pair Python optimizer
loop of the reference becomes one XLA program over all pairs at once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import se3
from ..ops.icp import iterative_closest_point
from ..ops.sinkhorn import sinkhorn_divergence

Array = jax.Array
Codes = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """Defaults mirror configs/more_3rscan.yaml:12-18."""

    n_steps: int = 400
    lr: float = 0.05
    lr_milestones: tuple = (300, 340, 380)
    lr_decay: float = 0.1
    early_stop_deg: float = 10.0
    sinkhorn_blur: float = 0.05
    sinkhorn_iters: int = 30
    # geomloss-style eps-annealing (the reference's SamplesLoss default):
    # ~9 update pairs instead of sinkhorn_iters fixed-temperature ones,
    # with better-converged potentials (tests/test_sinkhorn_fidelity.py).
    sinkhorn_anneal: bool = True
    sinkhorn_diameter: float = 2.0
    # geomloss's actual backward: the Sinkhorn loop runs detached and only
    # the final extrapolation pair is differentiated (Danskin gradient at
    # the converged potentials). Identical loss value, ~10x less backward
    # traffic over the (N, M) cost matrices per refine step.
    sinkhorn_implicit_grad: bool = True
    # VMEM-resident fused OT kernels on TPU (ops/pallas_sinkhorn.py).
    # False forces the XLA path — used by bench.py's FLOP-accounting
    # builds (Pallas kernel FLOPs are invisible to cost_analysis).
    sinkhorn_pallas: bool = True
    # bfloat16 decoder params + queries inside the 400-step refinement
    # loop (f32 pose/Adam state). The DeepSDF fwd+bwd dominates the
    # refine FLOPs (~6.5 PFLOP per 64-pair batch); bf16 halves its
    # traffic/compute on standard TPU runtimes. Off by default (parity).
    refine_bf16: bool = False
    icp_iterations: int = 100
    use_icp: bool = True
    # Fused ICP correspondence kernel (ops/pallas_icp.py); None = auto
    # (on for TPU with unmasked clouds). False pins the XLA path.
    icp_fused: bool | None = None
    # Ablation knobs (scripts/ablate_optim.py, VERDICT r3 weak #3 —
    # root-causing the 48-instance optim regression). Defaults match the
    # reference (more_solver.py:119-135 direction pick, :150-171
    # best-loss tracking).
    direction_pick: bool = True  # False: always optimize pc1 -> pc2
    track_best: bool = True  # False: return the final iterate, not best
    # Per-instance ICP acceptance (round-4 fix for the regression the
    # reference's unconditional polish causes, more_solver.py:181-184:
    # ICP has its own fixed point per instance and overwrites the
    # refinement where its basin is wrong — docs/ablate_optim_r4.json).
    #   "always"  reference behavior: ICP pose wins unconditionally
    #   "symch"   keep the ICP pose only where it lowers the symmetric
    #             mean-NN distance between the transformed source and tgt
    #   "sdf"     ... only where it lowers mean |decoder sdf| of the
    #             transformed source under the target's code (needs optim)
    # Proxy choice measured in scripts/probe_icp_accept.py
    # (docs/probe_icp_accept_r4.json, 48 instances, trained ckpt):
    #   reference "always": recall@RRE10/5 = 85.42/60.42
    #   no ICP at all:                       93.75/68.75
    #   "symch" acceptance:                  97.92/72.92  (oracle: 97.92/85.42)
    # so per-instance symmetric-chamfer acceptance is the production default;
    # "always" remains available for reference-faithful comparisons.
    icp_accept: str = "symch"


class RegistrationResult(NamedTuple):
    R: Array  # (B, 3, 3)
    t: Array  # (B, 3, 1)
    residual: Array  # (B,) mean Kabsch residual of the init


def kabsch_from_codes(codes1: Codes, codes2: Codes) -> RegistrationResult:
    """Closed-form registration: Kabsch on z_so3 + t correspondences."""
    f1 = codes1["z_so3"] + codes1["t"]
    f2 = codes2["z_so3"] + codes2["t"]
    R, t, res = se3.kabsch(f1, f2)
    return RegistrationResult(R=R, t=t, residual=jnp.mean(res, axis=-1))


def _smooth_l1(x: Array, beta: float = 1.0) -> Array:
    """torch.nn.SmoothL1Loss with zero target, mean reduction."""
    absx = jnp.abs(x)
    return jnp.mean(
        jnp.where(absx < beta, 0.5 * absx**2 / beta, absx - 0.5 * beta)
    )


def make_refine_loss(
    decode_sdf,
    src_pc: Array,
    tgt_pc: Array,
    shared_codes: Codes,
    R0: Array,
    t0: Array,
    cfg: RegistrationConfig = RegistrationConfig(),
):
    """Build (apply_g, loss_fn) for the SE(3) refinement objective.

    Exposed separately so bench.py can cost-analyze ONE gradient step:
    XLA's `cost_analysis` counts a `lax.scan` body exactly once regardless
    of trip count, so the 400-step program's true FLOPs are
    F(program) + (n_steps - 1) * F(grad step).
    """

    def apply_g(xi, pts):
        g = se3.se3_exp(xi)  # (B, 3, 4)
        R = g[..., :3, :3] @ R0
        t = g[..., :3, :3] @ t0 + g[..., :3, 3:]
        return jnp.matmul(pts, jnp.swapaxes(R, -1, -2)) + jnp.swapaxes(
            t, -1, -2
        ), (R, t)

    # The target cloud is constant across the whole refine scan, so its
    # OT self-correlation (debias) term is computed once here — a scan
    # constant — instead of every step.
    from ..ops.sinkhorn import sinkhorn_yy_term

    half_yy = sinkhorn_yy_term(
        tgt_pc, blur=cfg.sinkhorn_blur, iters=cfg.sinkhorn_iters,
        anneal=cfg.sinkhorn_anneal, diameter=cfg.sinkhorn_diameter,
        pallas=cfg.sinkhorn_pallas,
    )

    def loss_fn(xi):
        moved, _ = apply_g(xi, src_pc)
        sdf = decode_sdf(moved, shared_codes)
        sdf_loss = jax.vmap(_smooth_l1)(sdf)  # (B,)
        ot = sinkhorn_divergence(
            moved, tgt_pc, blur=cfg.sinkhorn_blur, iters=cfg.sinkhorn_iters,
            anneal=cfg.sinkhorn_anneal, diameter=cfg.sinkhorn_diameter,
            implicit_grad=cfg.sinkhorn_implicit_grad,
            half_ot_yy=half_yy,
            pallas=cfg.sinkhorn_pallas,
        )
        per_item = sdf_loss + ot
        return jnp.sum(per_item), per_item

    return apply_g, loss_fn


def refine_se3(
    decode_sdf,
    src_pc: Array,
    tgt_pc: Array,
    shared_codes: Codes,
    R0: Array,
    t0: Array,
    cfg: RegistrationConfig = RegistrationConfig(),
):
    """SE(3)-manifold refinement of an initial transform.

    Args:
      decode_sdf: fn (query (B,M,3), codes) -> sdf (B,M) — the shape prior
        field closed over params.
      src_pc/tgt_pc: (B, N, 3) / (B, M, 3).
      shared_codes: codes of the *target* frame (batch-aligned).
      R0/t0: (B,3,3), (B,3,1) initial transform src -> tgt.

    Returns (R, t, info) of the best-loss transform per batch element.
    """
    B = src_pc.shape[0]
    dtype = src_pc.dtype

    schedule = optax.piecewise_constant_schedule(
        cfg.lr, {m: cfg.lr_decay for m in cfg.lr_milestones}
    )
    opt = optax.adam(schedule)

    xi0 = jnp.zeros((B, 6), dtype)

    apply_g, loss_fn = make_refine_loss(
        decode_sdf, src_pc, tgt_pc, shared_codes, R0, t0, cfg
    )

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(carry, _):
        xi, opt_state, best_xi, best_loss, stopped = carry
        g, per_item = grad_fn(xi)
        updates, opt_state_new = opt.update(g, opt_state)
        xi_new = optax.apply_updates(xi, updates)

        improved = per_item < best_loss
        take = improved & ~stopped
        best_xi = jnp.where(take[:, None], xi, best_xi)
        best_loss = jnp.where(take, per_item, best_loss)

        # Early stop: rotation drift of the *current* iterate from init.
        drift = se3.rotation_error(
            se3.so3_exp(xi_new[:, 3:]),
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3)),
        )
        stopped_new = stopped | (drift > cfg.early_stop_deg)

        frozen = stopped[:, None]
        xi_out = jnp.where(frozen, xi, xi_new)
        opt_state_out = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(stopped, (B,) + (1,) * (new.ndim - 1)), old, new
            )
            if (new.ndim >= 1 and new.shape[:1] == (B,))
            else new,
            opt_state_new,
            opt_state,
        )
        return (xi_out, opt_state_out, best_xi, best_loss, stopped_new), None

    init = (
        xi0,
        opt.init(xi0),
        xi0,
        jnp.full((B,), jnp.inf, dtype),
        jnp.zeros((B,), bool),
    )
    (xi, _, best_xi, best_loss, stopped), _ = jax.lax.scan(
        step, init, None, length=cfg.n_steps
    )
    chosen = best_xi if cfg.track_best else xi
    _, (R, t) = apply_g(chosen, src_pc)
    return R, t, {"best_loss": best_loss, "stopped": stopped}


def solve_pairwise_registration(
    model,
    params,
    pc1: Array,
    pc2: Array,
    codes1: Optional[Codes] = None,
    codes2: Optional[Codes] = None,
    optim: bool = False,
    cfg: RegistrationConfig = RegistrationConfig(),
):
    """Full registration pipeline pc1 -> pc2 (more_solver.py:95-189), batched.

    pc1/pc2: (B, N, 3) already FPS-downsampled to the encoder input size.
    Returns (R (B,3,3), t (B,3,1)).
    """
    if codes1 is None:
        codes1 = model.encode(params, pc1)
    if codes2 is None:
        codes2 = model.encode(params, pc2)

    R, t, _ = kabsch_from_codes(codes1, codes2)

    if optim:
        decode = lambda q, c: model.decode_sdf(params, q, c)
        if cfg.refine_bf16:
            bf16 = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                t,
            )
            params_h = bf16(params)
            refine_decode = lambda q, c: model.decode_sdf(
                params_h, q.astype(jnp.bfloat16), bf16(c)
            ).astype(jnp.float32)
        else:
            refine_decode = decode
        # Direction pick: optimize toward the frame whose code explains its
        # own cloud better (more_solver.py:119-135).
        if cfg.direction_pick:
            err1 = jnp.mean(jnp.abs(decode(pc1, codes1)), axis=-1)
            err2 = jnp.mean(jnp.abs(decode(pc2, codes2)), axis=-1)
            fwd = err1 >= err2  # True: optimize pc1 -> pc2 against codes2
        else:
            fwd = jnp.ones(pc1.shape[0], bool)

        R_bwd, t_bwd, _ = kabsch_from_codes(codes2, codes1)
        sel = lambda a, b: jnp.where(
            jnp.reshape(fwd, (-1,) + (1,) * (a.ndim - 1)), a, b
        )
        src = sel(pc1, pc2)
        tgt = sel(pc2, pc1)
        shared = jax.tree.map(sel, codes2, codes1)
        R0 = sel(R, R_bwd)
        t0 = sel(t, t_bwd)

        R_opt, t_opt, _ = refine_se3(
            refine_decode, src, tgt, shared, R0, t0, cfg
        )
        # Invert the transform where we optimized pc2 -> pc1.
        R_inv = jnp.swapaxes(R_opt, -1, -2)
        t_inv = -jnp.matmul(R_inv, t_opt)
        R = sel(R_opt, R_inv)
        t = sel(t_opt, t_inv)

    if cfg.use_icp:
        res = iterative_closest_point(
            pc1,
            pc2,
            init_R=R,
            init_t=t[..., 0],
            max_iterations=cfg.icp_iterations,
            fused_stats=cfg.icp_fused,
        )
        R_icp, t_icp = res.R, res.t[..., None]
        if cfg.icp_accept == "always":
            R, t = R_icp, t_icp
        else:
            move = lambda Rm, tm: (
                jnp.einsum("bij,bnj->bni", Rm, pc1) + tm[..., 0][:, None]
            )
            if cfg.icp_accept == "symch":

                def proxy(moved):
                    # squared distances via one MXU matmul (no (B,N,M,3)
                    # transient); min(d^2) == min(d)^2 so sqrt after the min
                    d2 = (
                        jnp.sum(moved**2, -1)[:, :, None]
                        + jnp.sum(pc2**2, -1)[:, None]
                        - 2.0 * jnp.einsum("bnd,bmd->bnm", moved, pc2)
                    )
                    d = jnp.sqrt(jnp.maximum(d2, 0.0))
                    return jnp.min(d, 2).mean(1) + jnp.min(d, 1).mean(1)

            elif cfg.icp_accept == "sdf":
                proxy = lambda moved: jnp.abs(
                    model.decode_sdf(params, moved, codes2)
                ).mean(axis=-1)
            else:
                raise ValueError(f"icp_accept={cfg.icp_accept!r}")
            take = proxy(move(R_icp, t_icp)) < proxy(move(R, t))
            R = jnp.where(take[:, None, None], R_icp, R)
            t = jnp.where(take[:, None, None], t_icp, t)
    return R, t
