"""Entropic optimal transport on TPU.

Two flavors used by the reference pipeline:

1. `log_optimal_transport`: SuperGlue-style OT with a dustbin row/column used
   by the sinkhorn matcher (lib_more/matcher_new.py:11-40).
2. `sinkhorn_divergence`: debiased Sinkhorn divergence between point clouds,
   replacing geomloss.SamplesLoss('sinkhorn', p=2) used as the registration
   refinement loss (lib_more/more_solver.py:145,156).

Both are pure jnp with fixed iteration counts (lax.fori_loop), so they jit
and differentiate cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def log_sinkhorn_iterations(
    Z: Array, log_mu: Array, log_nu: Array, iters: int
) -> Array:
    """Log-space Sinkhorn normalization (matcher_new.py:11-17)."""

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.scipy.special.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.scipy.special.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: Array, alpha: Array, iters: int) -> Array:
    """Differentiable OT with dustbin (matcher_new.py:20-40).

    scores: (B, M, N); alpha: scalar dustbin score. Returns (B, M+1, N+1)
    log-coupling scaled by (M + N).
    """
    b, m, n = scores.shape
    ms = jnp.asarray(m, scores.dtype)
    ns = jnp.asarray(n, scores.dtype)
    alpha = jnp.asarray(alpha, scores.dtype)

    bins0 = jnp.full((b, m, 1), alpha, scores.dtype)
    bins1 = jnp.full((b, 1, n), alpha, scores.dtype)
    corner = jnp.full((b, 1, 1), alpha, scores.dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=-1),
            jnp.concatenate([bins1, corner], axis=-1),
        ],
        axis=1,
    )

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((m,), norm), jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate([jnp.full((n,), norm), jnp.log(ms)[None] + norm])
    log_mu = jnp.broadcast_to(log_mu, (b, m + 1)).astype(scores.dtype)
    log_nu = jnp.broadcast_to(log_nu, (b, n + 1)).astype(scores.dtype)

    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return Z - norm


# ---------------------------------------------------------------------------
# Debiased Sinkhorn divergence between point clouds
# ---------------------------------------------------------------------------

def _sq_cost(x: Array, y: Array) -> Array:
    """C(x, y) = |x - y|^2 / 2 (geomloss p=2 convention)."""
    d = jnp.sum((x[..., :, None, :] - y[..., None, :, :]) ** 2, axis=-1)
    return 0.5 * d


def _softmin_f(C, log_b, g, eps):
    """f_i = -eps logsumexp_j(log_b_j + (g_j - C_ij)/eps)."""
    return -eps * jax.scipy.special.logsumexp(
        log_b[..., None, :] + (g[..., None, :] - C) / eps, axis=-1
    )


def _softmin_g(C, log_a, f, eps):
    return -eps * jax.scipy.special.logsumexp(
        log_a[..., :, None] + (f[..., :, None] - C) / eps, axis=-2
    )


def _sym_potentials(C: Array, eps_schedule, iters: int,
                    detach_iters: bool = False):
    """Sinkhorn potentials for OT(a, b) with uniform weights — the
    geomloss algorithm (Feydy et al. 2019): damped *parallel* updates
    f <- (f + T(g))/2, g <- (g + T(f))/2 along the eps schedule, then one
    undamped extrapolation pair at the target eps.

    The parallel/damped form makes the potential sequence symmetric in
    (a, x) <-> (b, y), so for x == y the xy-potentials equal the
    self-correlation potentials and the debiased divergence vanishes
    exactly.
    """
    n, m = C.shape[-2], C.shape[-1]
    log_a = jnp.full(C.shape[:-1], -jnp.log(n), C.dtype)  # (..., n)
    log_b = jnp.full(C.shape[:-2] + (m,), -jnp.log(m), C.dtype)

    f = jnp.zeros(C.shape[:-1], C.dtype)
    g = jnp.zeros(C.shape[:-2] + (m,), C.dtype)

    def damped(f, g, eps):
        ft = _softmin_f(C, log_b, g, eps)
        gt = _softmin_g(C, log_a, f, eps)
        return 0.5 * (f + ft), 0.5 * (g + gt)

    if len(eps_schedule) > 1:
        # annealed: unrolled (schedule is short and static)
        for eps in eps_schedule:
            f, g = damped(f, g, eps)
        eps = eps_schedule[-1]
    else:
        eps = eps_schedule[0]
        f, g = jax.lax.fori_loop(
            0, max(iters - 1, 0), lambda _, fg: damped(*fg, eps), (f, g)
        )
    # last extrapolation: one undamped parallel pair. With detach_iters
    # the fixed-point iterates are stop_gradient-ed so the cotangent flows
    # only through this final update — exactly geomloss's backward
    # (Feydy et al. 2019 "extrapolation" trick: at convergence the inner
    # potentials are optimal, so by Danskin their gradient contribution
    # vanishes). This cuts the refine-loop backward from ~10 logsumexp
    # passes over the (N, M) cost matrix to one.
    if detach_iters:
        f = jax.lax.stop_gradient(f)
        g = jax.lax.stop_gradient(g)
    return _softmin_f(C, log_b, g, eps), _softmin_g(C, log_a, f, eps)


def _use_pallas_iterates(x) -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _potentials_from_points(
    x: Array, y: Array, schedule, iters: int,
    implicit_grad: bool, pallas: bool,
):
    """Potentials for OT(x, y): damped iterates + final extrapolation.

    With pallas=True (TPU + implicit_grad) the whole computation —
    cost-matrix build, damped annealing schedule, final extrapolation,
    AND the closed-form VJP of that extrapolation — runs in VMEM-resident
    Pallas kernels (ops/pallas_sinkhorn.ot_extrapolated_potentials); the
    (N, M) cost matrix never touches HBM in either direction. The XLA
    fallback materializes C and differentiates per `implicit_grad`.
    """
    if pallas:
        from .pallas_sinkhorn import ot_extrapolated_potentials

        squeeze = x.ndim == 2
        xb = x[None] if squeeze else x
        yb = y[None] if squeeze else y
        eff = tuple(schedule) if len(schedule) > 1 else tuple(
            [schedule[0]] * max(iters - 1, 1)
        )
        f, g = ot_extrapolated_potentials(xb, yb, eff)
        if squeeze:
            f, g = f[0], g[0]
        return f, g
    C = _sq_cost(x, y)
    return _sym_potentials(C, schedule, iters, detach_iters=implicit_grad)


def eps_annealing_schedule(
    blur: float, diameter: float = 2.0, scaling: float = 0.5, tail: int = 2
):
    """geomloss-style eps-scaling: temperatures from diameter^2 down to
    blur^2 by factor scaling^2, plus `tail` extra updates at the target
    (SamplesLoss('sinkhorn', p=2) default scaling=0.5). Static python list
    so the annealed loop unrolls under jit."""
    eps_target = blur**2
    schedule = []
    e = max(diameter, blur) ** 2
    while e > eps_target:
        schedule.append(e)
        e *= scaling**2
    schedule.extend([eps_target] * max(tail, 1))
    return schedule


def sinkhorn_yy_term(
    y: Array,
    blur: float = 0.05,
    iters: int = 50,
    anneal: bool = False,
    diameter: float = 2.0,
    scaling: float = 0.5,
    pallas: bool | None = None,
) -> Array:
    """The 0.5*OT(y, y) debias term of the divergence, value only.

    In the SE(3) refinement loss the target cloud is constant across all
    400 steps, so this term is a per-pair constant (zero gradient w.r.t.
    the pose); computing it ONCE outside the `lax.scan` removes a third
    of the per-step Sinkhorn cost-matrix traffic."""
    if anneal:
        schedule = eps_annealing_schedule(blur, diameter, scaling)
    else:
        schedule = [blur**2]
    f_yy, _ = _potentials_from_points(
        y, y, schedule, iters, True,
        _use_pallas_iterates(y) and (pallas is None or pallas),
    )
    return jnp.mean(f_yy, axis=-1)  # = 0.5 * ot_yy


def sinkhorn_divergence(
    x: Array,
    y: Array,
    blur: float = 0.05,
    iters: int = 50,
    anneal: bool = False,
    diameter: float = 2.0,
    scaling: float = 0.5,
    implicit_grad: bool = False,
    half_ot_yy: Array | None = None,
    pallas: bool | None = None,
) -> Array:
    """Debiased Sinkhorn divergence S_eps(x, y), eps = blur**2.

    x: (N, 3) or (B, N, 3); y: (M, 3) or (B, M, 3). Uniform weights.
    S = OT(x, y) - 0.5 OT(x, x) - 0.5 OT(y, y); differentiable in x and y.

    With anneal=True, uses geomloss-style eps-scaling (temperatures from
    diameter^2 to blur^2, one update pair each) instead of `iters`
    fixed-temperature iterations — matching the convergence behavior of the
    reference's SamplesLoss('sinkhorn', p=2) (more_solver.py:145,156) at a
    fraction of the updates. Validated against exact OT in
    tests/test_sinkhorn_fidelity.py.

    implicit_grad=True detaches the fixed-point iterations and
    differentiates only the final extrapolation pair — geomloss's actual
    backward (it runs its loop under torch.no_grad and re-attaches the
    last update). Identical value; the gradient is the converged
    (Danskin) gradient.

    half_ot_yy: optionally pass a precomputed `sinkhorn_yy_term(y, ...)`
    to skip the y-self correlation entirely (its gradient w.r.t. x is
    zero and its value is constant when y is fixed, as in the
    registration refinement scan).
    """
    if anneal:
        schedule = eps_annealing_schedule(blur, diameter, scaling)
    else:
        schedule = [blur**2]
    use_pallas = (
        implicit_grad
        and _use_pallas_iterates(x)
        and (pallas is None or pallas)
    )
    f_xy, g_xy = _potentials_from_points(
        x, y, schedule, iters, implicit_grad, use_pallas
    )
    f_xx, _ = _potentials_from_points(
        x, x, schedule, iters, implicit_grad, use_pallas
    )

    ot_xy = jnp.mean(f_xy, axis=-1) + jnp.mean(g_xy, axis=-1)
    half_ot_xx = jnp.mean(f_xx, axis=-1)
    if half_ot_yy is None:
        f_yy, _ = _potentials_from_points(
            y, y, schedule, iters, implicit_grad, use_pallas
        )
        half_ot_yy = jnp.mean(f_yy, axis=-1)
    return ot_xy - half_ot_xx - half_ot_yy
