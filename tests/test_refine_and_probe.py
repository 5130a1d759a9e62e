"""Round-3 capability tails: refine_mesh port + per-module NaN probe.

Mirrors the last two reference surfaces VERDICT round 2 flagged:
* Generator3D.refine_mesh (mesh_extractor2.py:245-302) — gradient-based
  vertex refinement.
* per-module NaN/Inf forward hooks (core/solver_utils.py:5-54) — the
  flax interceptor probe must name the offending submodule.
"""
import jax
import jax.numpy as jnp
import numpy as np


def test_refine_mesh_pulls_vertices_to_isosurface():
    """Start from a slightly-off sphere mesh; refinement against an
    analytic occupancy field must move vertices toward the 0.5 level set
    (|r| -> 0.4) and reduce the level-set residual."""
    from livingscenes_tpu.recon.extractor import (
        MeshExtractorConfig,
        extract_mesh_from_grid,
        refine_mesh_vertices,
    )
    from livingscenes_tpu.recon.grid import dense_grid_values

    R0 = 0.4
    sharp = 20.0  # logits slope: sigmoid(20*(R0-r)) crosses 0.5 at r=R0
    field = lambda q, c: sharp * (R0 - jnp.linalg.norm(q, axis=-1))

    cfg = MeshExtractorConfig(
        resolution0=16, upsampling_steps=0, simplify_nfaces=None
    )
    grid = dense_grid_values(
        lambda pts: field(pts[None], None)[0], 16, box_size=cfg.box_size
    )
    mesh = extract_mesh_from_grid(np.asarray(grid), cfg)
    assert len(mesh.vertices) > 0

    # perturb vertices off the surface
    rng = np.random.default_rng(0)
    noisy = mesh.vertices + rng.normal(0, 0.02, mesh.vertices.shape).astype(
        np.float32
    )
    r_before = np.abs(np.linalg.norm(noisy, axis=1) - R0).mean()

    refined = np.asarray(
        refine_mesh_vertices(
            field, {}, noisy, mesh.faces, n_steps=50, lr=2e-3
        )
    )
    r_after = np.abs(np.linalg.norm(refined, axis=1) - R0).mean()
    assert r_after < 0.6 * r_before, (r_before, r_after)


def test_extractor_refinement_step_config():
    """MeshExtractor honors refinement_step > 0 end to end (the reference
    config surface: generation.refinement_step)."""
    from livingscenes_tpu.recon.extractor import (
        MeshExtractor,
        MeshExtractorConfig,
    )

    field = lambda q, c: 20.0 * (
        0.4 * c["s"][:, None] - jnp.linalg.norm(q, axis=-1)
    )
    ext = MeshExtractor(
        field,
        MeshExtractorConfig(
            resolution0=12,
            upsampling_steps=0,
            simplify_nfaces=None,
            refinement_step=5,
        ),
    )
    codes = {"s": jnp.ones((1,)), "t": jnp.zeros((1, 1, 3))}
    mesh = ext.generate_from_codes(codes)
    assert len(mesh.vertices) > 0
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(r.mean() - 0.4) < 0.05


def test_locate_nonfinite_modules_names_offender():
    """Poison one submodule's parameters; the probe must name it (and not
    flag a clean model)."""
    import flax.linen as nn

    from livingscenes_tpu.utils.debugging import locate_nonfinite_modules

    class Inner(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4, name="lin")(x)

    class Outer(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = Inner(name="a")(x)
            h = Inner(name="b")(h)
            return jnp.sum(h)

    m = Outer()
    x = jnp.ones((2, 4))
    params = m.init(jax.random.PRNGKey(0), x)

    _, bad = locate_nonfinite_modules(m, params, x)
    assert bad == []

    poisoned = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.full_like(v, jnp.nan)
        if any(getattr(k, "key", None) == "b" for k in p)
        else v,
        params,
    )
    _, bad = locate_nonfinite_modules(m, poisoned, x)
    assert bad, "probe found nothing"
    assert any("b" in entry for entry in bad), bad
    assert not any("/a" in entry for entry in bad), bad
