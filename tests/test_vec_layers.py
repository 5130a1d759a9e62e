"""Equivariance unit tests for the VN layer library.

These make the reference's ad-hoc __main__ self-checks
(vec_layers.py:698-821) into real assertions:
  so3 mode:  f(s.R.x) = s.R.f(x)
  se3 mode:  f(s.R.x + t) = s.R.f(x) + t
Run in float64 with tight tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from livingscenes_tpu.nn.vec_layers import (
    VecActivation,
    VecLNA,
    VecLinear,
    VecResBlock,
    channel_equi_vec_normalize,
)

B, N, C = 2, 33, 16
ACT = lambda x: jax.nn.leaky_relu(x, 0.2)


def f64(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float64), tree)


def make_input(rng):
    return jnp.asarray(rng.normal(size=(B, N, C, 3)))


def random_sim3(rng, with_t):
    R = jnp.asarray(Rotation.random(B, random_state=rng.integers(1 << 30)).as_matrix())
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=(B,)))
    t = jnp.asarray(rng.normal(size=(B, 3))) if with_t else jnp.zeros((B, 3))
    return R, s, t


def apply_sim3(x, R, s, t):
    """x: (B, ..., C, 3) -> s.R.x + t applied to every vector channel."""
    y = jnp.einsum("bij,b...j->b...i", R, x * s[:, None, None, None])
    return y + t[:, None, None, :]


def check_equivariance(module, rng, mode, atol=1e-10, scalar_in=False):
    x = make_input(rng)
    s_feat = jnp.asarray(rng.normal(size=(B, N, 8))) if scalar_in else None
    args = (x, s_feat) if scalar_in else (x,)
    params = f64(module.init(jax.random.PRNGKey(0), *args))

    def run(v):
        out = module.apply(params, *((v, s_feat) if scalar_in else (v,)))
        return out[0] if isinstance(out, tuple) else out

    y = run(x)
    R, s, t = random_sim3(rng, with_t=(mode == "se3"))
    y_aug = apply_sim3(y, R, s, t)
    y_hat = run(apply_sim3(x, R, s, t))
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_aug), atol=atol)


def test_channel_normalize_equivariant(rng):
    x = make_input(rng)
    R, s, _ = random_sim3(rng, with_t=False)
    y = channel_equi_vec_normalize(x)
    y_hat = channel_equi_vec_normalize(apply_sim3(x, R, s, jnp.zeros((B, 3))))
    # scale-invariant and rotation-equivariant
    y_rot = jnp.einsum("bij,b...j->b...i", R, y)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_rot), atol=1e-12)


@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_vec_linear(rng, mode):
    check_equivariance(VecLinear(C, 24, mode=mode), rng, mode)


@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_vec_linear_hybrid_scalar(rng, mode):
    check_equivariance(
        VecLinear(C, 24, s_in=8, s_out=6, mode=mode), rng, mode, scalar_in=True
    )


def test_vec_linear_scalar_out_invariant(rng):
    """The scalar output must be SIM(3)-invariant."""
    module = VecLinear(C, 24, s_out=6, mode="se3")
    x = make_input(rng)
    params = f64(module.init(jax.random.PRNGKey(0), x))
    _, s_out = module.apply(params, x)
    R, s, t = random_sim3(rng, with_t=True)
    _, s_out_aug = module.apply(params, apply_sim3(x, R, s, t))
    np.testing.assert_allclose(np.asarray(s_out_aug), np.asarray(s_out), atol=1e-9)


@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_vec_activation(rng, mode):
    check_equivariance(VecActivation(C, ACT, mode=mode), rng, mode)


@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_vec_lna(rng, mode):
    check_equivariance(VecLNA(C, 20, act_func=ACT, mode=mode), rng, mode)


@pytest.mark.parametrize("mode", ["so3", "se3"])
def test_vec_resblock(rng, mode):
    check_equivariance(
        VecResBlock(C, 20, 12, act_func=ACT, mode=mode), rng, mode
    )


def test_vec_linear_cross(rng):
    check_equivariance(VecLinear(C, 24, mode="so3", cross=True), rng, "so3")


def test_vec_resblock_same_channels_shortcut(rng):
    check_equivariance(VecResBlock(C, C, C, act_func=ACT, mode="se3"), rng, "se3")


def test_mm_bf16_preserves_equivariance_approximately(rng):
    """bf16 matmuls keep structural equivariance up to bf16 rounding."""
    module = VecLinear(C, 24, mode="so3", mm_bf16=True)
    x = jnp.asarray(rng.normal(size=(B, N, C, 3)), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    y = module.apply(params, x)
    R, s, _ = random_sim3(rng, with_t=False)
    R32 = R.astype(jnp.float32)
    s32 = s.astype(jnp.float32)
    y_aug = apply_sim3(y, R32, s32, jnp.zeros((B, 3), jnp.float32))
    y_hat = module.apply(params, apply_sim3(x, R32, s32, jnp.zeros((B, 3), jnp.float32)))
    scale = float(jnp.abs(y).max())
    assert float(jnp.abs(y_hat - y_aug).max()) < 0.05 * scale
