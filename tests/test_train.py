"""Training stack tests: loss decreases on synthetic data, sharded train
step on the 8-device CPU mesh, checkpoint round-trip, config system."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.models.shape_prior import ShapePriorConfig
from livingscenes_tpu.models.sim3recon import SIM3Recon, TrainLossConfig
from livingscenes_tpu.parallel.sharding import make_mesh
from livingscenes_tpu.train import (
    AugmentConfig,
    SyntheticShapeDataset,
    Trainer,
    TrainerConfig,
    apply_overrides,
    batch_iterator,
    load_config,
    update_recursive,
)

TINY = ShapePriorConfig(
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


def make_trainer(tmp_path, mesh=None, **kw):
    model = SIM3Recon(TINY, TrainLossConfig())
    defaults = dict(
        batch_size=4,
        log_dir=str(tmp_path / "run"),
        log_every=5,
        checkpoint_iter=0,
    )
    defaults.update(kw)
    return Trainer(model, TrainerConfig(**defaults), mesh=mesh)


def make_dataset():
    return SyntheticShapeDataset(
        n_items=16, n_pcl=64, n_uni=64, n_nss=64, n_eval=128
    )


def test_loss_decreases(tmp_path):
    trainer = make_trainer(tmp_path)
    state = trainer.init_state()
    it = batch_iterator(make_dataset(), 4, seed=0)
    losses = []
    for _ in range(30):
        m = trainer.train_step(state, next(it))
        losses.append(float(m["batch_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert all(np.isfinite(losses))


def test_sharded_train_step_on_mesh(tmp_path):
    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    trainer = make_trainer(tmp_path, mesh=mesh, batch_size=8)
    state = trainer.init_state()
    it = batch_iterator(make_dataset(), 8, seed=0)
    m1 = trainer.train_step(state, next(it))
    m2 = trainer.train_step(state, next(it))
    assert np.isfinite(float(m1["batch_loss"]))
    assert np.isfinite(float(m2["batch_loss"]))


def test_sharded_matches_unsharded(tmp_path):
    """The dp-sharded step must produce the same loss/update as single
    device (psum of per-shard grads == full-batch grad)."""
    it = batch_iterator(make_dataset(), 8, seed=0)
    batch = next(it)

    t1 = make_trainer(tmp_path / "a", batch_size=8)
    s1 = t1.init_state()
    m1 = t1.train_step(s1, batch)

    mesh = make_mesh(jax.devices()[:8], axis_names=("dp",))
    t2 = make_trainer(tmp_path / "b", mesh=mesh, batch_size=8)
    s2 = t2.init_state()
    m2 = t2.train_step(s2, batch)

    np.testing.assert_allclose(
        float(m1["batch_loss"]), float(m2["batch_loss"]), rtol=1e-5
    )
    # params after one step agree (up to f32 reduction-order noise through
    # Adam's rsqrt; update magnitude is the 1e-4 LR)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer(tmp_path)
    state = trainer.init_state()
    it = batch_iterator(make_dataset(), 4, seed=0)
    trainer.train_step(state, next(it))
    trainer.save_checkpoint(state, "latest")
    restored = trainer.load_checkpoint(state, "latest")
    assert restored.step == state.step
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_loop_with_eval_and_selection(tmp_path):
    trainer = make_trainer(
        tmp_path, eval_every_iter=10, eval_batches=1, checkpoint_iter=10
    )
    state = trainer.init_state()
    ds = make_dataset()
    it = batch_iterator(ds, 4, seed=0)
    state = trainer.run(
        state,
        it,
        val_iter_factory=lambda: batch_iterator(ds, 4, seed=1),
        total_iter=21,
    )
    ckpt_dir = os.path.join(trainer.cfg.log_dir, "checkpoint")
    assert os.path.exists(os.path.join(ckpt_dir, "latest.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "10.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "selected.ckpt"))
    assert os.path.exists(
        os.path.join(trainer.cfg.log_dir, "metrics.jsonl")
    )


def test_loss_clip_zeroes_gradient(tmp_path):
    """A diverged loss (> loss_clip) must produce a (near) zero update."""
    trainer = make_trainer(tmp_path, loss_clip=1e-9)
    state = trainer.init_state()
    before = jax.tree.map(np.asarray, state.params)
    it = batch_iterator(make_dataset(), 4, seed=0)
    trainer.train_step(state, next(it))
    # loss >> clip -> clamp -> zero grad -> adam moves by ~0 (eps only)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)


def test_augmentations_shapes(rng):
    ds = SyntheticShapeDataset(
        n_items=4, n_pcl=128, n_uni=32, n_nss=32, n_eval=32,
        aug=AugmentConfig(aug_ratio=1.0),
    )
    item = ds[0]
    assert item["inputs"].shape == (128, 3)
    assert np.isfinite(item["points_uni_value"]).all()
    # occupancy labels are consistent with sdf sign
    assert set(np.unique(item["eval_points_occ"])) <= {0.0, 1.0}


def test_config_merge_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("model:\n  lr: 0.1\n  depth: 4\nname: base\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f"inherit_from: {base}\nmodel:\n  lr: 0.01\nextra: 1\n"
    )
    cfg = load_config(str(child))
    assert cfg["model"]["lr"] == 0.01
    assert cfg["model"]["depth"] == 4
    assert cfg["name"] == "base" and cfg["extra"] == 1
    apply_overrides(cfg, ["model.depth=8", "new.key=hello"])
    assert cfg["model"]["depth"] == 8
    assert cfg["new"]["key"] == "hello"


def test_update_recursive_no_aliasing():
    dst = {"a": {"b": 1}}
    src = {"a": {"c": [1, 2]}}
    update_recursive(dst, src)
    src["a"]["c"].append(3)
    assert dst["a"]["c"] == [1, 2]


def test_viz_sample_writes_outputs(tmp_path):
    trainer = make_trainer(tmp_path, viz_iter_interval=5, eval_every_iter=100)
    state = trainer.init_state()
    ds = make_dataset()
    it = batch_iterator(ds, 4, seed=0)
    trainer.visualize_sample(state, next(it), step=1)
    viz = os.path.join(trainer.cfg.log_dir, "viz")
    assert os.path.exists(os.path.join(viz, "input_1.png"))


def test_anomaly_mode_catches_nan(tmp_path):
    trainer = make_trainer(tmp_path, anomaly=True)
    state = trainer.init_state()
    it = batch_iterator(make_dataset(), 4, seed=0)
    batch = next(it)
    m = trainer.train_step(state, batch)  # clean batch passes
    assert np.isfinite(float(m["batch_loss"]))
    bad = dict(batch)
    bad["inputs"] = batch["inputs"].copy()
    bad["inputs"][0, 0, 0] = np.nan
    with pytest.raises(Exception):
        trainer.train_step(state, bad)


def test_logger_histogram(tmp_path):
    from livingscenes_tpu.train.logger import TrainLogger

    lg = TrainLogger(str(tmp_path))
    lg.log_histogram("train", 3, "residuals", np.arange(100.0))
    import json as _json

    recs = [
        _json.loads(l)
        for l in open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    h = [r for r in recs if r.get("hist") == "residuals"][0]
    assert h["p50"] == 49.5 and h["p0"] == 0.0 and h["p100"] == 99.0


def test_decoder_bf16_loss_drift(tmp_path):
    """TrainLossConfig.decoder_bf16 (models/sim3recon.py) runs the decoder
    matmuls in bfloat16 behind an f32 geometry/loss path. The knob must
    (a) change only the decoder arithmetic — loss value within bf16
    rounding of the f32 path — and (b) keep gradients finite and close in
    direction (VERDICT r4 ask #7: no production knob without a test)."""
    model32 = SIM3Recon(TINY, TrainLossConfig())
    model16 = SIM3Recon(TINY, TrainLossConfig(decoder_bf16=True))
    params = model32.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    B = 4
    batch = {
        "inputs": jnp.asarray(rng.normal(size=(B, 64, 3)), jnp.float32),
        "points_uni": jnp.asarray(rng.normal(size=(B, 32, 3)), jnp.float32),
        "points_uni_value": jnp.asarray(rng.normal(size=(B, 32)), jnp.float32),
        "points_nss": jnp.asarray(rng.normal(size=(B, 32, 3)), jnp.float32),
        "points_nss_value": jnp.asarray(rng.normal(size=(B, 32)), jnp.float32),
    }

    loss32, m32 = model32.loss(params, batch, train=False)
    loss16, m16 = model16.loss(params, batch, train=False)
    # |sdf| is O(1) after the smooth-L1 weighting; bf16 has ~3 significant
    # digits, the MLP is 8 layers deep -> a few % drift is the honest bound
    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) < 0.05 * max(
        abs(float(loss32)), 1e-3
    )

    g32 = jax.grad(lambda p: model32.loss(p, batch, train=False)[0])(params)
    g16 = jax.grad(lambda p: model16.loss(p, batch, train=False)[0])(params)
    flat32 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
    flat16 = jnp.concatenate(
        [x.astype(jnp.float32).ravel() for x in jax.tree.leaves(g16)]
    )
    assert bool(jnp.all(jnp.isfinite(flat16)))
    cos = float(
        jnp.vdot(flat32, flat16)
        / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-30)
    )
    assert cos > 0.95, f"bf16 gradient direction drifted: cos={cos}"


def test_shape_kinds_torus_and_default_stream():
    """shape_kinds=(3,) (the held-out torus family for the ICP-acceptance
    out-of-family probe) must yield true near-surface samples of a genus-1
    SDF, and the default (0, 1, 2) must reproduce the historical RNG
    stream bit-for-bit (every seeded benchmark depends on it)."""
    from livingscenes_tpu.train.data import SyntheticShapeDataset, _sdf_torus

    # default stream unchanged: explicit (0,1,2) == implicit default
    a = SyntheticShapeDataset(n_items=2, n_pcl=64, seed=11)
    b = SyntheticShapeDataset(n_items=2, n_pcl=64, seed=11,
                              shape_kinds=(0, 1, 2))
    for i in range(2):
        for k in a[i]:
            np.testing.assert_array_equal(a[i][k], b[i][k])

    # torus family: surface points sit on the analytic zero level set
    ds = SyntheticShapeDataset(n_items=1, n_pcl=128, seed=5,
                               shape_kinds=(3,))
    rng = np.random.default_rng(5)
    sdf = ds._shape_sdf(rng)
    pts = ds._surface_points(sdf, rng, 128)
    assert np.abs(sdf(pts)).max() < 5e-3
    # genus-1: the donut hole (axis region at y=0) is OUTSIDE the shape
    assert sdf(np.zeros((1, 3)))[0] > 0.05
    # direct check of the SDF helper: point on the centerline circle
    assert abs(_sdf_torus(np.array([[0.3, 0.0, 0.0]]), 0.3, 0.1)[0] + 0.1) < 1e-12
