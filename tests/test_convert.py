"""Checkpoint converter tests: flax -> torch-layout -> flax round trip with
forward-output equality, plus torch-file loading via torch.load."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livingscenes_tpu.models.convert import (
    load_torch_checkpoint,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from livingscenes_tpu.models.shape_prior import ShapePrior, ShapePriorConfig

SMALL = ShapePriorConfig(
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


@pytest.fixture(scope="module")
def model_and_params():
    model = ShapePrior(SMALL)
    params = model.init_params(jax.random.PRNGKey(3))
    return model, params


def test_roundtrip_preserves_forward(model_and_params):
    model, params = model_and_params
    sd = params_to_torch_state_dict(params)
    # every key uses the reference training layout prefix
    assert all(k.startswith("network_dict.") for k in sd)
    back = torch_state_dict_to_params(sd)

    pc = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3)), jnp.float32)
    c1 = model.encode(params, pc)
    c2 = model.encode(back, pc)
    for k in c1:
        np.testing.assert_allclose(
            np.asarray(c1[k]), np.asarray(c2[k]), atol=1e-5
        )
    q = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.decode_sdf(params, q, c1)),
        np.asarray(model.decode_sdf(back, q, c2)),
        atol=1e-5,
    )


def test_expected_reference_key_names(model_and_params):
    _, params = model_and_params
    sd = params_to_torch_state_dict(params)
    # spot-check the names the reference checkpoint uses
    assert "network_dict.encoder.V_list.0.lin.weight" in sd
    assert "network_dict.encoder.Q_list.2.act.lin_dir.weight" in sd
    assert "network_dict.encoder.global_conv_list.0.lin.weight" in sd
    assert "network_dict.encoder.conv_c.lin.weight" in sd
    assert "network_dict.encoder.fc_inv.weight" in sd
    assert "network_dict.encoder.fc_center.lin1.weight" in sd
    assert "network_dict.decoder.lin0.weight_v" in sd
    assert "network_dict.decoder.lin0.weight_g" in sd
    # weight_g has the torch (out, 1) shape
    assert sd["network_dict.decoder.lin0.weight_g"].ndim == 2
    # final decoder layer is a plain linear
    assert "network_dict.decoder.lin8.weight" in sd


def test_weight_norm_semantics_match_torch(model_and_params):
    """Our WNDense(v, g, b) must equal torch's weight_norm(Linear) with the
    converted tensors."""
    import torch

    _, params = model_and_params
    lin0 = params["decoder"]["lin0"]
    x = np.random.default_rng(2).normal(size=(5, lin0["v"].shape[0])).astype(
        np.float32
    )
    # torch side
    tl = torch.nn.Linear(lin0["v"].shape[0], lin0["v"].shape[1])
    tl = torch.nn.utils.weight_norm(tl)
    with torch.no_grad():
        tl.weight_v.copy_(torch.from_numpy(np.asarray(lin0["v"]).T))
        tl.weight_g.copy_(
            torch.from_numpy(np.asarray(lin0["g"]).reshape(-1, 1))
        )
        tl.bias.copy_(torch.from_numpy(np.asarray(lin0["b"])))
        torch_out = tl(torch.from_numpy(x)).numpy()
    # flax side
    from livingscenes_tpu.nn.deepsdf import WNDense

    layer = WNDense(lin0["v"].shape[1])
    out = layer.apply({"params": lin0}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), torch_out, atol=1e-5)


def test_load_torch_checkpoint_file(tmp_path, model_and_params):
    import torch

    model, params = model_and_params
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in params_to_torch_state_dict(params).items()
    }
    path = tmp_path / "ckpt_latest.pt"
    torch.save({"model_state_dict": sd, "epoch": 7}, path)
    loaded = load_torch_checkpoint(str(path))
    pc = jnp.asarray(np.random.default_rng(5).normal(size=(1, 64, 3)), jnp.float32)
    c1 = model.encode(params, pc)
    c2 = model.encode(loaded, pc)
    np.testing.assert_allclose(
        np.asarray(c1["z_inv"]), np.asarray(c2["z_inv"]), atol=1e-5
    )
