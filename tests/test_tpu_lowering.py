"""AOT-lower every Pallas kernel for the TPU platform — on CPU.

Interpret-mode equality tests (the rest of tests/) never run the
Pallas -> Mosaic lowering, so a kernel edit can pass the whole suite and
still fail to compile on the real chip. `jax.jit(f).trace(...).lower(
lowering_platforms=("tpu",))` runs that lowering without any TPU device,
catching unsupported-op / layout regressions in CI. (The residual risk,
Mosaic -> LLO backend compilation, still needs a chip — bench.py falls
back to the XLA build if that ever fails.)

Shapes are production-representative but small where the lowering is
shape-generic (trace time, not coverage, is the limit).
"""
import contextlib
import sys
import types
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

# The TPU lowering of the larger kernels sits just under Python's default
# recursion limit when invoked standalone and just over it under pytest's
# extra frames.
sys.setrecursionlimit(10000)


def _lower_tpu(fn, *args):
    # Trace under x64-disabled: the production (bench/inference) runtime
    # never enables x64, and tracing these kernels with the test suite's
    # global x64 flag trips an unbounded-recursion JAX bug in Mosaic's
    # convert_element_type lowering.
    with jax.enable_x64(False):
        jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


rng = np.random.default_rng(0)
f32 = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)


@contextlib.contextmanager
def _fake_tpu_platform():
    """Make the library's `jax.devices()[0].platform == "tpu"` gates
    take the TPU branch during TRACING (lowering needs no device).
    Without this, the full-program tests silently lower the XLA
    fallback builds instead of the kernels the chip will run — the
    un-mocked first version of these tests missed two real Mosaic
    constraint violations that way. Params must be initialized OUTSIDE
    the mock (init executes eagerly on the CPU backend)."""
    fake = [types.SimpleNamespace(platform="tpu")]
    with mock.patch.object(jax, "devices", lambda *a, **k: fake):
        yield


def test_fused_edge_mean_lowers_for_tpu():
    from livingscenes_tpu.nn.pallas_attention import fused_edge_mean

    B, Ns, Nd, C, O, K = 1, 1024, 1024, 32, 32, 16
    src, dst = f32(B, Ns, C, 3), f32(B, Nd, C, 3)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    W, D = f32(O, 2 * C), f32(O, O)
    _lower_tpu(fused_edge_mean, src, dst, idx, W, D)
    _lower_tpu(
        jax.grad(
            lambda s, d, w, dd: jnp.sum(
                fused_edge_mean(s, d, idx, w, dd) ** 2
            ),
            argnums=(0, 1, 2, 3),
        ),
        src, dst, W, D,
    )


def test_fused_edge_attention_lowers_for_tpu():
    from livingscenes_tpu.nn.pallas_attention import fused_edge_attention

    # production L2 ratios: N 1024 -> 512, C 32 -> 64
    B, Ns, Nd, C, O, K = 1, 1024, 512, 32, 64, 16
    src, dst = f32(B, Ns, C, 3), f32(B, Nd, C, 3)
    qn = f32(B, Nd, O, 3)
    idx = jnp.asarray(rng.integers(0, Ns, (B, Nd, K)), jnp.int32)
    WK, DK = f32(O, 2 * C), f32(O, O)
    WV, DV = f32(O, 2 * C), f32(O, O)

    def fwd(s, d, q, wk, dk, wv, dv):
        return fused_edge_attention(s, d, idx, q, wk, dk, wv, dv, head_c=16)

    _lower_tpu(fwd, src, dst, qn, WK, DK, WV, DV)
    _lower_tpu(
        jax.grad(
            lambda *a: jnp.sum(fwd(*a) ** 2), argnums=tuple(range(7))
        ),
        src, dst, qn, WK, DK, WV, DV,
    )


def test_layer0_kernel_lowers_for_tpu():
    from livingscenes_tpu.nn.pallas_layer0 import fused_layer0_edge_mean

    B, N, O, K = 1, 1024, 32, 16
    xyz = f32(B, N, 3)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    W, D = f32(O, 3), f32(O, O)
    _lower_tpu(fused_layer0_edge_mean, xyz, idx, W, D)
    _lower_tpu(
        jax.grad(
            lambda x, w, d: jnp.sum(
                fused_layer0_edge_mean(x, idx, w, d) ** 2
            ),
            argnums=(0, 1, 2),
        ),
        xyz, W, D,
    )


def test_icp_stats_kernel_lowers_for_tpu():
    from livingscenes_tpu.ops.pallas_icp import icp_iteration_stats

    B, N, M = 4, 1024, 1024
    x, src, tgt = f32(B, N, 3), f32(B, N, 3), f32(B, M, 3)
    _lower_tpu(lambda a, b, c: icp_iteration_stats(a, b, c), x, src, tgt)


def test_knn_and_scale_kernels_lower_for_tpu():
    from livingscenes_tpu.ops.pallas_knn import knn_pallas
    from livingscenes_tpu.ops.pallas_scale import top_k_mean_pairwise_distance

    B, N = 2, 1024
    pts = f32(B, N, 3)
    _lower_tpu(lambda p: knn_pallas(p, p, 16), pts)
    _lower_tpu(lambda p: top_k_mean_pairwise_distance(p, 5), pts)


def test_fps_kernel_lowers_for_tpu():
    from livingscenes_tpu.ops.pallas_fps import fps_pallas

    pts = f32(8, 1024, 3)  # B must be a multiple of the batch tile (8)
    _lower_tpu(lambda p: fps_pallas(p, 512), pts)


def test_sinkhorn_kernels_lower_for_tpu():
    from livingscenes_tpu.ops.pallas_sinkhorn import (
        ot_extrapolated_potentials,
        sinkhorn_iterates,
    )
    from livingscenes_tpu.ops.sinkhorn import eps_annealing_schedule

    B, N, M = 2, 1024, 1024
    x, y = f32(B, N, 3), f32(B, M, 3)
    schedule = tuple(eps_annealing_schedule(blur=0.05, diameter=2.0))
    _lower_tpu(lambda a, b: sinkhorn_iterates(a, b, schedule), x, y)

    def ot_loss(a, b):
        f, g = ot_extrapolated_potentials(a, b, schedule)
        return jnp.sum(f) + jnp.sum(g)

    _lower_tpu(ot_loss, x, y)
    _lower_tpu(jax.grad(ot_loss, argnums=(0, 1)), x, y)


def test_headline_pipeline_lowers_for_tpu():
    """The COMPLETE bench.py headline program (Pallas build: fused
    attention/mean/layer0 encode + fused ICP + matching) lowers for TPU
    devicelessly — the strongest pre-chip check the CPU suite can run."""
    from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
    from livingscenes_tpu.solver.pipeline import (
        PipelineConfig,
        build_scene_pair_pipeline,
    )
    from livingscenes_tpu.solver.registration import RegistrationConfig

    with jax.enable_x64(False):
        model = ShapePrior(ShapePriorConfig(pallas_attention=True))
        params = model.init_params(jax.random.PRNGKey(0))
        with _fake_tpu_platform():
            pipeline = build_scene_pair_pipeline(
                model,
                PipelineConfig(
                    optim=False,
                    registration=RegistrationConfig(
                        use_icp=True, icp_iterations=100,
                        sinkhorn_pallas=True,
                    ),
                ),
                mesh=None,
            )
            ref = f32(2, 8, 1024, 3)
            res = f32(2, 8, 1024, 3)
            pipeline.trace(params, ref, res).lower(
                lowering_platforms=("tpu",)
            )


def test_optim_pipeline_lowers_for_tpu():
    """The optim=True relocalization program (fused OT kernels + refine
    scan) at a short step count — same kernels as production n_steps=400."""
    from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
    from livingscenes_tpu.solver.pipeline import (
        PipelineConfig,
        build_scene_pair_pipeline,
    )
    from livingscenes_tpu.solver.registration import RegistrationConfig

    with jax.enable_x64(False):
        model = ShapePrior(ShapePriorConfig(pallas_attention=True))
        params = model.init_params(jax.random.PRNGKey(0))
        with _fake_tpu_platform():
            pipeline = build_scene_pair_pipeline(
                model,
                PipelineConfig(
                    optim=True,
                    registration=RegistrationConfig(
                        n_steps=3, lr_milestones=(2,), use_icp=True,
                        icp_iterations=5, sinkhorn_pallas=True,
                    ),
                ),
                mesh=None,
            )
            ref = f32(1, 8, 1024, 3)
            res = f32(1, 8, 1024, 3)
            pipeline.trace(params, ref, res).lower(
                lowering_platforms=("tpu",)
            )


def test_train_step_lowers_for_tpu():
    """The Pallas-build train step (custom-VJP backward kernels in their
    real surrounding program)."""
    from livingscenes_tpu.models.shape_prior import ShapePriorConfig
    from livingscenes_tpu.models.sim3recon import SIM3Recon
    from livingscenes_tpu.train.trainer import Trainer, TrainerConfig

    with jax.enable_x64(False):
        model = SIM3Recon(ShapePriorConfig(pallas_attention=True))
        trainer = Trainer(
            model,
            TrainerConfig(batch_size=4, log_dir="/tmp/lstpu_lowering_test"),
            mesh=None,
        )
        state = trainer.init_state()
        batch = {
            "inputs": f32(4, 1024, 3),
            "points_uni": f32(4, 512, 3),
            "points_uni_value": f32(4, 512),
            "points_nss": f32(4, 512, 3),
            "points_nss_value": f32(4, 512),
        }
        placed = trainer.place_batch(batch)
        key = jax.random.PRNGKey(0)
        with _fake_tpu_platform():
            trainer._train_step.trace(
                state.params, state.opt_state, placed, key
            ).lower(lowering_platforms=("tpu",))


def test_knn_topk_scale_kernel_lowers_for_tpu():
    from livingscenes_tpu.ops.pallas_knn import knn_with_topk_scale

    pts = f32(2, 1024, 3)
    _lower_tpu(lambda p: knn_with_topk_scale(p, 16), pts)


def test_recon_pipeline_lowers_for_tpu():
    """The recon=True, encode_fps=True bench program — the COMPLETE
    _solve_end2end equivalent (FPS front end -> encode -> match ->
    register -> code transport -> hierarchical occupancy grids) at the
    production extraction settings (res0 32, 2 upsampling steps). This is
    the fourth bench.py program; a Mosaic regression here must fail the
    suite rather than silently null the end2end_with_recon metric
    (VERDICT r3 ask #6). Match: the MISE loop it replaces,
    lib_shape_prior/.../mesh_extractor2.py:109-133."""
    from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
    from livingscenes_tpu.solver.pipeline import (
        PipelineConfig,
        build_scene_pair_pipeline,
    )
    from livingscenes_tpu.solver.registration import RegistrationConfig

    with jax.enable_x64(False):
        model = ShapePrior(
            ShapePriorConfig(pallas_attention=True, n_pcl=512)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        with _fake_tpu_platform():
            pipeline = build_scene_pair_pipeline(
                model,
                PipelineConfig(
                    optim=False,
                    registration=RegistrationConfig(
                        use_icp=True, icp_iterations=100,
                        sinkhorn_pallas=True,
                    ),
                    recon=True,
                    encode_fps=True,
                ),
                mesh=None,
            )
            n_full = 4096
            ref = f32(1, 8, n_full, 3)
            res = f32(1, 8, n_full, 3)
            mask = jnp.ones((1, 8, n_full), bool)
            pipeline.trace(params, ref, res, mask, mask).lower(
                lowering_platforms=("tpu",)
            )
