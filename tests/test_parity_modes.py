"""A/B tests: production fast-path flags vs parity mode, and our
disambiguation chain logic vs the reference's actual implementation
(VERDICT round-1 weak #4 and #9)."""
import ast

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu import se3
from livingscenes_tpu.eval.rescan3r import disambiguate
from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
from livingscenes_tpu.solver.matcher import sequential_matcher
from livingscenes_tpu.solver.registration import (
    RegistrationConfig,
    solve_pairwise_registration,
)

TINY = dict(
    c_dim=32,
    num_layers=4,
    feat_dim=(16, 16, 32, 32),
    down_sample_layers=(2,),
    down_sample_factor=(2,),
    atten_start_layer=2,
    atten_multi_head_c=8,
    num_knn=8,
    scale_factor=10.0,
    decoder_dims=(96,) * 8,
    n_pcl=128,
)


# ---------------------------------------------------------------------------
# disambiguate vs reference
# ---------------------------------------------------------------------------

def _load_reference_disambiguate():
    """Extract the reference's disambiguiate function (eval_3rscan.py:189-230)
    by AST so its heavy module imports (pytorch3d, trimesh, pcu, ...) are
    not needed."""
    src = open("/root/reference/eval_3rscan.py").read()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "disambiguiate"
    )
    ns = {"np": np}
    exec(compile(ast.Module([fn], []), "eval_3rscan.py", "exec"), ns)
    return ns["disambiguiate"]


def _random_ambiguity(rng, n_ids):
    """Random cyclic ambiguity groups in the 3RScan json structure."""
    groups = []
    ids = rng.permutation(n_ids).tolist()
    while len(ids) >= 2:
        k = int(rng.integers(2, min(4, len(ids)) + 1))
        cycle, ids = ids[:k], ids[k:]
        pairs = []
        for a, b in zip(cycle, cycle[1:] + cycle[:1]):
            t = np.eye(4)
            t[:3, 3] = rng.normal(size=3)
            pairs.append(
                {
                    "instance_source": int(a),
                    "instance_target": int(b),
                    "transform": t.T.reshape(-1).tolist(),
                }
            )
        groups.append(pairs)
    return groups  # list of pair-groups, as eval_3rscan consumes it


def test_disambiguate_matches_reference():
    ref_fn = _load_reference_disambiguate()
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(4, 12))
        ambiguity = _random_ambiguity(rng, n)
        gt = rng.integers(0, n, size=8)
        pred = rng.integers(0, n, size=8)
        ours = disambiguate(pred.copy(), gt.copy(), ambiguity)
        theirs = ref_fn(pred.copy(), gt.copy(), ambiguity)
        np.testing.assert_array_equal(
            ours, np.asarray(theirs), err_msg=f"trial {trial}"
        )


# ---------------------------------------------------------------------------
# production fast flags vs parity mode
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ab_setup():
    parity = ShapePrior(ShapePriorConfig(**TINY, parity=True))
    prod = ShapePrior(ShapePriorConfig(**TINY, parity=False))
    params = jax.tree.map(
        lambda x: x.astype(jnp.float32),
        parity.init_params(jax.random.PRNGKey(0), n_points=128),
    )
    rng = np.random.default_rng(5)
    objs = rng.normal(size=(6, 128, 3)).astype(np.float32) * rng.uniform(
        0.3, 1.0, (6, 1, 3)
    ).astype(np.float32)
    ref = objs + rng.uniform(-2, 2, (6, 1, 3)).astype(np.float32)
    from scipy.spatial.transform import Rotation

    Rm = Rotation.random(6, random_state=1).as_matrix().astype(np.float32)
    tm = rng.normal(size=(6, 1, 3)).astype(np.float32) * 0.4
    rescan = np.einsum("bij,bnj->bni", Rm, ref) + tm
    return parity, prod, params, jnp.asarray(ref), jnp.asarray(rescan), Rm


def test_production_flags_match_parity_mode(ab_setup):
    """Bound what approx_knn / matmul-gather / fused-KV cost: identical
    matching decisions and registration within recall noise on synthetic
    scenes (VERDICT #7's A/B)."""
    parity, prod, params, ref, rescan, Rm = ab_setup
    cp = parity.encode(params, ref)
    cq = prod.encode(params, ref)
    # invariant embeddings agree to fast-math tolerance
    denom = float(jnp.abs(cp["z_inv"]).max())
    drift = float(jnp.abs(cp["z_inv"] - cq["z_inv"]).max()) / denom
    assert drift < 5e-2, f"z_inv drift {drift:.2e}"

    # identical matching decisions
    cp2 = parity.encode(params, rescan)
    cq2 = prod.encode(params, rescan)
    m_parity = sequential_matcher(cp["z_inv"], cp2["z_inv"])["matches0"]
    m_prod = sequential_matcher(cq["z_inv"], cq2["z_inv"])["matches0"]
    np.testing.assert_array_equal(np.asarray(m_parity), np.asarray(m_prod))

    # registration: both modes recover the GT rotation; RRE delta below
    # registration-recall noise (<< the 10-degree recall threshold)
    cfg = RegistrationConfig(use_icp=True, icp_iterations=10)
    Rp, tp = solve_pairwise_registration(
        parity, params, ref, rescan, cp, cp2, optim=False, cfg=cfg
    )
    Rq, tq = solve_pairwise_registration(
        prod, params, ref, rescan, cq, cq2, optim=False, cfg=cfg
    )
    rre_p = np.asarray(se3.rotation_error(Rp, jnp.asarray(Rm)))
    rre_q = np.asarray(se3.rotation_error(Rq, jnp.asarray(Rm)))
    assert np.all(rre_p < 1.0) and np.all(rre_q < 1.0), (rre_p, rre_q)
    assert np.abs(rre_p - rre_q).max() < 0.5
    assert float(jnp.abs(tp - tq).max()) < 0.02
