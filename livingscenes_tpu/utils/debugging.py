"""Runtime invariant checking and profiling hooks.

Replaces the reference's anomaly machinery (core/solver_utils.py naninf
forward hooks + torch.autograd.detect_anomaly, SURVEY.md §5) with
jit-compatible equivalents:

* `checkify_nan` wraps a jitted function with jax.experimental.checkify
  float checks — NaN/Inf anywhere inside raises with a located error
  (the `--anomaly` mode analog).
* `assert_finite` — lightweight in-graph guard via equinox-style
  jax.debug callback printing offending metric names.
* `profile_trace` — context manager around jax.profiler for per-phase
  traces (replacing the reference's wall-clock stats_dict timers,
  mesh_extractor2.py:128-207).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

log = logging.getLogger(__name__)


def checkify_nan(fn: Callable) -> Callable:
    """Wrap fn so NaN/Inf produced anywhere inside raises a located
    checkify error. Usage:

        safe_step = checkify_nan(train_step)
        metrics = safe_step(params, batch)   # raises on NaN
    """
    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def locate_nonfinite_modules(module, variables, *args, **kwargs):
    """Per-submodule NaN/Inf localization.

    The reference registers forward hooks on every torch submodule under
    --anomaly (core/solver_utils.py:5-54) so a non-finite forward names the
    offending layer. Flax analog: run an EAGER forward pass with a method
    interceptor that checks every submodule's output. Returns
    (output, bad_paths) where bad_paths lists "scope/path:ModuleType" for
    each submodule whose output contains NaN/Inf (innermost first —
    interceptors unwind from the leaves).

    Debug-only: the host-side finiteness check forces eager sync per
    module, exactly like the reference's hooks.
    """
    import flax.linen as nn

    bad: list[str] = []

    def interceptor(next_fn, iargs, ikwargs, context):
        out = next_fn(*iargs, **ikwargs)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.inexact
            ):
                if not bool(jnp.all(jnp.isfinite(leaf))):
                    try:
                        path = "/".join(context.module.scope.path)
                    except Exception:
                        path = context.module.name or ""
                    bad.append(
                        f"{path or '<root>'}:{type(context.module).__name__}"
                    )
                    break
        return out

    with nn.intercept_methods(interceptor):
        out = module.apply(variables, *args, **kwargs)
    return out, bad


def assert_finite(tree, name: str = "tree"):
    """In-graph finite check; logs via jax.debug.callback when violated.
    Safe inside jit (no host sync on the happy path)."""

    def report(bad, path):
        if bad:
            log.error("non-finite values in %s/%s", name, path)

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        p = "/".join(str(k) for k in path)
        bad = ~jnp.all(jnp.isfinite(leaf))
        jax.debug.callback(report, bad, p)


@contextlib.contextmanager
def profile_trace(log_dir: str | None = None, label: str = "trace"):
    """jax.profiler trace if a log_dir is given, else wall-clock timing."""
    t0 = time.perf_counter()
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
    log.info("[profile] %s: %.3fs", label, time.perf_counter() - t0)


def device_memory_stats() -> dict:
    """Per-device memory usage (the reference's gpu_summarize logging role,
    logger_meta/metric_logger.py:91-94). Returns {} on backends without
    memory stats."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


class StepTimer:
    """Named phase timers (the stats_dict pattern of the reference's mesh
    extractor, as a reusable utility)."""

    def __init__(self):
        self.stats = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self.stats[name] = self.stats.get(name, 0.0) + (
            time.perf_counter() - t0
        )
