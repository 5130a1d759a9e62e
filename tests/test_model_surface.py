"""Model-surface completeness: cls head, rot_aug, converter coverage.

Mirrors the reference's optional heads/augs: classification head
(model_utils.py:131-146, sim3sdf_vanilla.py:221-231,340-347) and the
rotation augmentation (sim3sdf_vanilla.py:269-275).
"""
import jax
import jax.numpy as jnp
import numpy as np

from livingscenes_tpu.models.convert import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig
from livingscenes_tpu.models.sim3recon import SIM3Recon, TrainLossConfig

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
    n_pcl=64,
)


def f64(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float64), tree)


def make_batch(rng, B=2, with_class=False):
    batch = {
        "inputs": jnp.asarray(rng.normal(size=(B, 64, 3)), jnp.float32),
        "points_uni": jnp.asarray(rng.normal(size=(B, 16, 3)), jnp.float32),
        "points_uni_value": jnp.asarray(
            rng.normal(size=(B, 16)), jnp.float32
        ),
        "points_nss": jnp.asarray(rng.normal(size=(B, 16, 3)), jnp.float32),
        "points_nss_value": jnp.asarray(
            rng.normal(size=(B, 16)), jnp.float32
        ),
    }
    if with_class:
        batch["class"] = jnp.asarray(rng.integers(0, 5, size=(B,)))
    return batch


def test_cls_head_shapes_and_loss():
    cfg = ShapePriorConfig(**TINY, use_cls=True, num_cates=5)
    model = SIM3Recon(cfg, TrainLossConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    assert "cls_head" in params
    rng = np.random.default_rng(0)
    batch = make_batch(rng, with_class=True)
    loss, metrics = model.loss(params, batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_cls" in metrics and "metric_bs_cls_acc" in metrics
    assert 0.0 <= float(metrics["metric_bs_cls_acc"]) <= 1.0
    # batch_loss metric includes the cls term
    np.testing.assert_allclose(float(metrics["batch_loss"]), float(loss))

    # classify() directly
    codes = model.prior.encode(params, batch["inputs"])
    logits = model.prior.classify(params, codes)
    assert logits.shape == (2, 5)


def test_cls_head_converter_roundtrip():
    """Converter maps network_dict.cls_head.{0,2,4}.* both ways with zero
    warnings/drops."""
    cfg = ShapePriorConfig(**TINY, use_cls=True, num_cates=5)
    model = ShapePrior(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sd = params_to_torch_state_dict(params)
    cls_keys = sorted(k for k in sd if "cls_head" in k)
    assert cls_keys == [
        f"network_dict.cls_head.{i}.{kind}"
        for i in (0, 2, 4)
        for kind in ("bias", "weight")
    ]
    back = torch_state_dict_to_params(sd)
    flat_a = {
        jax.tree_util.keystr(p): a
        for p, a in jax.tree_util.tree_leaves_with_path(params["cls_head"])
    }
    flat_b = {
        jax.tree_util.keystr(p): b
        for p, b in jax.tree_util.tree_leaves_with_path(back["cls_head"])
    }
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=0
        )

    # classify gives identical outputs through the round-trip
    z = jnp.asarray(np.random.default_rng(1).normal(size=(3, 32)), jnp.float32)
    codes = {"z_inv": z}
    out_a = model.classify(params, codes)
    out_b = model.classify({**params, "cls_head": back["cls_head"]}, codes)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)


import pytest


@pytest.mark.parametrize(
    "decoder_type", ["inner_deepsdf", "deepsdf", "inner", "inv_mlp"]
)
def test_rot_aug_recon_loss_invariant(decoder_type):
    """Every decoder_type in this repo decodes through the invariant query
    (<q, z_so3>, ||q||), so with the query co-rotated (rot_aug always
    rotates it here — unlike the reference's canonical-space exclusion
    list, sim3sdf_vanilla.py:273-275, whose type names don't correspond to
    canonical-space decoders in this repo) the recon losses are
    rotation-invariant: rot_aug must not change them (f64, train=False so
    no dropout/center noise)."""
    cfg = ShapePriorConfig(**TINY, decoder_type=decoder_type)
    base = SIM3Recon(cfg, TrainLossConfig(rot_aug=False, center_aug_std=0.0))
    aug = SIM3Recon(cfg, TrainLossConfig(rot_aug=True, center_aug_std=0.0))
    params = f64(base.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(2)
    batch = {k: v.astype(jnp.float64) for k, v in make_batch(rng).items()}
    key = jax.random.PRNGKey(3)
    _, m0 = base.loss(params, batch, rng=key, train=False)
    _, m1 = aug.loss(params, batch, rng=key, train=False)
    np.testing.assert_allclose(
        float(m1["loss_recon_uni"]), float(m0["loss_recon_uni"]), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(m1["loss_recon_nss"]), float(m0["loss_recon_nss"]), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(m1["metric_t"]), float(m0["metric_t"]), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(m1["loss_s"]), float(m0["loss_s"]), rtol=1e-9
    )


def test_rot_aug_changes_inputs_seen_by_encoder():
    """rot_aug actually rotates (the flag is not a silent no-op): the
    z_so3-dependent quantities must differ from the unaugmented run."""
    cfg = ShapePriorConfig(**TINY)
    aug = SIM3Recon(cfg, TrainLossConfig(rot_aug=True, center_aug_std=0.0))
    params = f64(aug.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(4)
    batch = {k: v.astype(jnp.float64) for k, v in make_batch(rng).items()}
    key = jax.random.PRNGKey(5)
    # loss_t uses the L1 norm of the (rotated) centroid — rotation variant.
    _, m_aug = aug.loss(params, batch, rng=key, train=False)
    base = SIM3Recon(cfg, TrainLossConfig(rot_aug=False, center_aug_std=0.0))
    _, m_base = base.loss(params, batch, rng=key, train=False)
    assert abs(float(m_aug["loss_t"]) - float(m_base["loss_t"])) > 1e-12


def test_pe_projector_decode_and_invariance():
    """use_pe (sim3sdf_vanilla.py:212-219,387-396,407-412): PE channels
    appended to the invariant query; SDF at co-rotated queries invariant
    under SIM(3) of the input (the PE axes are equivariant)."""
    from scipy.spatial.transform import Rotation

    cfg = ShapePriorConfig(
        **{**TINY, "decoder_dims": (192,) * 8}, use_pe=True, pe_src=8,
        pe_pow=3,
    )
    model = ShapePrior(cfg)
    params = f64(model.init_params(jax.random.PRNGKey(0)))
    assert "pe_projector" in params
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(2, 64, 3)))
    query = jnp.asarray(rng.normal(size=(2, 16, 3)))

    codes = model.encode(params, pc)
    x = model.invariant_query(query, codes, params=params)
    assert x.shape[-1] == 2 * 32 + 1 + 8 * (1 + 2 * 3)
    sdf = model.decode_sdf(params, query, codes)
    assert sdf.shape == (2, 16)

    R = jnp.asarray(Rotation.random(2, random_state=1).as_matrix())
    pc_rot = jnp.einsum("bij,bnj->bni", R, pc)
    q_rot = jnp.einsum("bij,bnj->bni", R, query)
    codes_rot = model.encode(params, pc_rot)
    sdf_rot = model.decode_sdf(params, q_rot, codes_rot)
    np.testing.assert_allclose(
        np.asarray(sdf_rot), np.asarray(sdf), atol=1e-8
    )


def test_pe_projector_converter_roundtrip():
    from livingscenes_tpu.models.convert import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )

    cfg = ShapePriorConfig(
        **{**TINY, "decoder_dims": (192,) * 8}, use_pe=True, pe_src=8
    )
    model = ShapePrior(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sd = params_to_torch_state_dict(params)
    assert "network_dict.pe_projector.weight" in sd
    back = torch_state_dict_to_params(sd)
    np.testing.assert_allclose(
        np.asarray(params["pe_projector"]["weight"]),
        back["pe_projector"]["weight"],
        atol=0,
    )
@pytest.mark.parametrize(
    "name", ["plateau_r3_selected.ckpt", "plateau_r4_selected.ckpt",
             "production_r5_selected.ckpt"]
)
def test_committed_plateau_checkpoint_loads_and_encodes(name):
    """The in-repo trained checkpoints (weights/plateau_r3_selected.ckpt,
    the 30k-run selected params; weights/plateau_r4_selected.ckpt, the
    100k-run selected params at step 72k, val IoU 0.914;
    weights/production_r5_selected.ckpt, the production-operating-point
    40k run at n_pcl 1024 / batch 64, selected step 39k, val IoU 0.893)
    must keep loading
    through the public solver entry point and produce finite, sane codes —
    guards the artifacts against checkpoint-format or param-tree drift."""
    import os

    from livingscenes_tpu.eval.run_flyingshape import load_solver

    path = os.path.join(os.path.dirname(__file__), "..", "weights", name)
    solver = load_solver(path, fast=False)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(
        rng.normal(size=(1, 512, 3)) * 0.3, jnp.float32
    )
    codes = solver.model.encode(solver.params, pc)
    assert codes["z_inv"].shape == (1, 256)
    assert codes["z_so3"].shape == (1, 256, 3)
    for key in ("z_inv", "z_so3", "s", "t"):
        assert bool(jnp.isfinite(codes[key]).all()), key
    # trained (not random-init) weights: scale head calibrated near the
    # cloud's actual size rather than the raw top-5-distance init
    assert float(codes["s"][0]) > 0


def test_decode_sdf_matmul_dtype_bf16_drift():
    """decode_sdf(matmul_dtype=bfloat16) (models/shape_prior.py) casts
    only the decoder MLP matmuls; the invariant-query geometry stays f32
    and the output comes back as the query dtype. Drift vs the f32 path
    must stay within bf16 rounding of the SDF scale (VERDICT r4 ask #7 —
    this is the knob recon_bf16 / decoder_bf16 both route through)."""
    cfg = ShapePriorConfig(**TINY)
    model = ShapePrior(cfg)
    params = model.init_params(jax.random.PRNGKey(0), n_points=64)
    rng = np.random.default_rng(5)
    pc = jnp.asarray(rng.normal(size=(2, 64, 3)) * 0.4, jnp.float32)
    codes = model.encode(params, pc)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 256, 3)), jnp.float32)

    sdf32 = model.decode_sdf(params, q, codes)
    sdf16 = model.decode_sdf(params, q, codes, matmul_dtype=jnp.bfloat16)
    assert sdf16.dtype == sdf32.dtype  # cast back to the query dtype
    scale = float(jnp.std(sdf32)) + 1e-6
    # 8 bf16 matmuls deep: worst case under ~10% of the field's dynamic
    # range, typical well under 2% (the mesh-level consequence is bounded
    # separately in tests/test_recon.py::test_bf16_grid_mesh_accuracy)
    assert float(jnp.max(jnp.abs(sdf16 - sdf32))) < 0.10 * scale
    assert float(jnp.mean(jnp.abs(sdf16 - sdf32))) < 0.02 * scale
    # occupancy_logits threads the same knob
    lo16 = model.occupancy_logits(params, q, codes, matmul_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(lo16), cfg.sdf2occ_factor * np.asarray(sdf16), rtol=1e-6
    )
