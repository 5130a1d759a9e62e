"""Headline benchmark: end-to-end scene-pair throughput (match + register).

Measures the BASELINE.json metric "scene-pairs/sec match+register" on the
real TPU chip: for a batch of synthetic scene pairs (S objects x 1024 pts
per scan), run the full pipeline — encode every instance of both scans,
sequential matching, batched Kabsch + ICP registration of all matched
pairs — as compiled XLA programs, and report steady-state scene pairs per
second.

vs_baseline compares against an estimated reference throughput of
1.5 scene-pairs/sec on an RTX 4090 (the reference repo publishes no
numbers — BASELINE.md; estimate = per-scene cost of 2xS encoder forwards
with pytorch3d kNN/FPS + S python-loop ICP registrations + greedy matcher
at S=8, 1024 pts, on the reference's stated hardware, README.md:43).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

# Persistent compilation cache: repeated bench runs (and the driver's
# end-of-round run) skip the multi-minute XLA/Pallas compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/lstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

REFERENCE_SCENE_PAIRS_PER_SEC = 1.5  # documented estimate, see docstring

N_SCENES = 8  # scene pairs per measured batch
N_OBJ = 8  # instances per scan
N_PTS = 1024  # points per instance (reference n_input_point)


def build():
    from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
    from livingscenes_tpu.solver.matcher import sequential_matcher
    from livingscenes_tpu.solver.registration import (
        RegistrationConfig,
        solve_pairwise_registration,
    )

    model = ShapePrior(ShapePriorConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    reg_cfg = RegistrationConfig(use_icp=True, icp_iterations=30)

    @jax.jit
    def scene_pair_pipeline(params, ref_pc, rescan_pc):
        """ref_pc/rescan_pc: (S, O, N, 3) batched scene pairs."""
        S, O, N, _ = ref_pc.shape
        flat_ref = ref_pc.reshape(S * O, N, 3)
        flat_res = rescan_pc.reshape(S * O, N, 3)
        codes_ref = model.encode(params, flat_ref)
        codes_res = model.encode(params, flat_res)

        z_ref = codes_ref["z_inv"].reshape(S, O, -1)
        z_res = codes_res["z_inv"].reshape(S, O, -1)
        matches = jax.vmap(lambda a, b: sequential_matcher(a, b)["matches0"])(
            z_ref, z_res
        )  # (S, O)

        partner = jnp.where(matches >= 0, matches, 0)
        flat_partner = (
            partner + jnp.arange(S)[:, None] * O
        ).reshape(-1)
        pc2 = jnp.take(flat_res, flat_partner, axis=0)
        c2 = jax.tree.map(
            lambda x: jnp.take(x, flat_partner, axis=0), codes_res
        )
        R, t = solve_pairwise_registration(
            model, params, flat_ref, pc2, codes_ref, c2,
            optim=False, cfg=reg_cfg,
        )
        # Small scalar checksum: fetching it on the host forces the whole
        # pipeline to execute (block_until_ready alone does not synchronize
        # on the tunneled axon platform).
        checksum = (
            jnp.sum(R) + jnp.sum(t) + jnp.sum(matches.astype(jnp.float32))
        )
        return matches, R, t, checksum

    return scene_pair_pipeline, params


def make_scenes(rng):
    from scipy.spatial.transform import Rotation

    objs = rng.uniform(-0.5, 0.5, (N_SCENES, N_OBJ, N_PTS, 3)).astype(
        np.float32
    ) * rng.uniform(0.3, 1.0, (N_SCENES, N_OBJ, 1, 3)).astype(np.float32)
    offsets = rng.uniform(-3, 3, (N_SCENES, N_OBJ, 1, 3)).astype(np.float32)
    ref = objs + offsets
    Rm = Rotation.random(N_SCENES * N_OBJ, random_state=0).as_matrix()
    Rm = Rm.reshape(N_SCENES, N_OBJ, 3, 3).astype(np.float32)
    tm = rng.normal(size=(N_SCENES, N_OBJ, 1, 3)).astype(np.float32) * 0.5
    rescan = np.einsum("soij,sonj->soni", Rm, ref) + tm
    perm = np.stack([rng.permutation(N_OBJ) for _ in range(N_SCENES)])
    rescan = np.stack([rescan[s][perm[s]] for s in range(N_SCENES)])
    return jnp.asarray(ref), jnp.asarray(rescan)


def main():
    rng = np.random.default_rng(0)
    pipeline, params = build()
    ref, rescan = make_scenes(rng)

    # compile + one full sync
    out = pipeline(params, ref, rescan)
    float(out[-1])

    n_rounds = 5
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        out = pipeline(params, ref, rescan)
    float(out[-1])  # host fetch = real synchronization
    dt = time.perf_counter() - t0

    pairs_per_sec = N_SCENES * n_rounds / dt
    print(
        json.dumps(
            {
                "metric": "scene_pairs_per_sec_match_register",
                "value": round(pairs_per_sec, 3),
                "unit": "scene-pairs/sec (8 obj x 1024 pts, encode+match+register+ICP)",
                "vs_baseline": round(
                    pairs_per_sec / REFERENCE_SCENE_PAIRS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
