import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrhints_tpu.core.structs import RayBundle
from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
from nrhints_tpu.render.renderer import (
    ModelConfig,
    RendererConfig,
    extract_sdf_grid,
    init_model_params,
    render_rays,
)


def tiny_config(**renderer_kwargs) -> ModelConfig:
    rdefaults = dict(
        n_samples=16,
        n_importance_samples=16,
        up_sample_steps=4,
        n_shadow_samples=16,
        n_shadow_importance_samples=16,
    )
    rdefaults.update(renderer_kwargs)
    return ModelConfig(
        sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
        reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
        renderer=RendererConfig(**rdefaults),
    )


def make_rays(n=8, seed=0):
    rng = np.random.default_rng(seed)
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = -2.5
    dirs = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    dirs[:, 2] += 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pls = np.tile(np.array([[1.0, 2.0, 2.0]], np.float32), (n, 1))
    mid = -np.sum(origins * dirs, -1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        pl_positions=jnp.asarray(pls),
        nears=jnp.asarray(mid - 1.0),
        fars=jnp.asarray(mid + 1.0),
    )


@pytest.fixture(scope="module")
def cfg_params():
    cfg = tiny_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_render_shapes_and_finiteness(cfg_params):
    cfg, params = cfg_params
    rays = make_rays(8)
    out = render_rays(params, cfg, rays, background_rgb=jnp.ones((1, 3)))
    n_total = cfg.renderer.n_samples + cfg.renderer.n_importance_samples
    assert out.rgb.shape == (8, 3)
    assert out.depth.shape == (8, 1)
    assert out.weights.shape == (8, n_total)
    assert out.analytic_normals.shape == (8, n_total, 3)
    assert out.visibilities.shape == (8, 1)
    assert out.specular_cue.shape == (8, n_total, 4)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_render_weights_are_valid(cfg_params):
    cfg, params = cfg_params
    out = render_rays(params, cfg, make_rays(8), background_rgb=jnp.zeros((1, 3)))
    w = np.asarray(out.weights)
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-4).all()


def test_render_shadow_transmittance_in_unit_range(cfg_params):
    cfg, params = cfg_params
    out = render_rays(params, cfg, make_rays(8))
    v = np.asarray(out.visibilities)
    assert (v >= 0).all() and (v <= 1.0 + 1e-5).all()


def test_render_training_mode_uses_rng(cfg_params):
    cfg, params = cfg_params
    rays = make_rays(4)
    o1 = render_rays(params, cfg, rays, jax.random.PRNGKey(0), is_training=True)
    o2 = render_rays(params, cfg, rays, jax.random.PRNGKey(1), is_training=True)
    assert not np.allclose(np.asarray(o1.rgb), np.asarray(o2.rgb))
    o3 = render_rays(params, cfg, rays, jax.random.PRNGKey(0), is_training=True)
    np.testing.assert_allclose(np.asarray(o1.rgb), np.asarray(o3.rgb), atol=1e-6)


def test_render_geometry_warmup_zeroes_hints(cfg_params):
    cfg, params = cfg_params
    out = render_rays(
        params, cfg, make_rays(4), jax.random.PRNGKey(0),
        is_training=True, geometry_warmup=True,
    )
    np.testing.assert_array_equal(np.asarray(out.visibilities), 0.0)
    np.testing.assert_array_equal(np.asarray(out.specular_cue), 0.0)


def test_render_no_hints_config():
    cfg = tiny_config(shadow_hint=False, specular_hint=False)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    out = render_rays(params, cfg, make_rays(4))
    assert out.visibilities is None
    assert out.specular_cue is None


def test_render_with_background_nerf():
    cfg = tiny_config(use_outside_nerf=True, n_outside_samples=8)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    out = render_rays(params, cfg, make_rays(4))
    n_total = cfg.renderer.n_samples + cfg.renderer.n_importance_samples
    assert out.weights.shape == (4, n_total + cfg.renderer.n_outside_samples)
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_render_depth_types():
    for depth_type in ("alpha_blending", "maximum_point"):
        cfg = tiny_config(depth_type=depth_type)
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        out = render_rays(params, cfg, make_rays(4))
        assert np.isfinite(np.asarray(out.depth)).all()


def test_render_partial_shadow_hint():
    cfg = tiny_config(n_shadow_importance_clip=4)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    out = render_rays(params, cfg, make_rays(4))
    assert out.visibilities.shape == (4, 1)
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_render_gradients_flow(cfg_params):
    """Full loss (L1 + eikonal) must be differentiable wrt all params —
    including the double-backward through SDF normals."""
    cfg, params = cfg_params
    rays = make_rays(4)
    gt = jnp.full((4, 3), 0.5)

    def loss_fn(p):
        out = render_rays(
            p, cfg, rays, jax.random.PRNGKey(0), is_training=True,
            cos_anneal_ratio=0.5, background_rgb=jnp.ones((1, 3)),
        )
        rgb_loss = jnp.sum(jnp.abs(out.rgb - gt)) / (out.rgb.shape[0] + 1e-5)
        grad_err = (jnp.linalg.norm(out.analytic_normals, axis=-1) - 1.0) ** 2
        mask = out.relax_inside_sphere
        eik = jnp.sum(mask * grad_err) / (jnp.sum(mask) + 1e-5)
        return rgb_loss + 0.1 * eik

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # SDF and color nets must both receive signal.
    assert np.abs(np.asarray(grads["sdf"]["lin0"]["v"])).max() > 0
    assert np.abs(np.asarray(grads["color"]["lin0"]["v"])).max() > 0
    assert np.abs(np.asarray(grads["variance"]["variance"])).max() > 0


def test_render_jit_compiles(cfg_params):
    cfg, params = cfg_params
    rays = make_rays(4)
    f = jax.jit(
        lambda p, r: render_rays(p, cfg, r, background_rgb=jnp.zeros((1, 3)))
    )
    out1 = f(params, rays)
    out2 = f(params, rays)
    np.testing.assert_allclose(np.asarray(out1.rgb), np.asarray(out2.rgb), atol=1e-6)


def test_extract_sdf_grid_sphere(cfg_params):
    cfg, params = cfg_params
    grid = extract_sdf_grid(params, cfg, [-1.0] * 3, [1.0] * 3, 16, block=8)
    assert grid.shape == (16, 16, 16)
    g = np.asarray(grid)
    # -sdf: positive inside the init sphere (center), negative far outside.
    assert g[8, 8, 8] > 0
    assert g[0, 0, 0] < 0


def test_partial_clip_must_divide_samples():
    import dataclasses

    import pytest

    from nrhints_tpu.render.renderer import ModelConfig, RendererConfig

    cfg = ModelConfig(renderer=RendererConfig(n_shadow_importance_clip=3))
    import jax
    import jax.numpy as jnp

    from nrhints_tpu.core.structs import RayBundle
    from nrhints_tpu.render.renderer import init_model_params, render_rays

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    rays = RayBundle(
        origins=jnp.zeros((2, 3)),
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1)),
        pl_positions=jnp.ones((2, 3)),
        nears=jnp.zeros((2, 1)),
        fars=jnp.full((2, 1), 2.0),
    )
    with pytest.raises(ValueError, match="must divide"):
        render_rays(params, cfg, rays)


def test_fused_march_rejects_bad_geometry():
    """The public kernel entry points validate the z-buffer geometry the
    validity masks assume (shape check runs before any compile)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
    from nrhints_tpu.kernels.march import fused_importance_z

    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="fused march needs z0 with 64"):
        fused_importance_z(
            params, cfg,
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.zeros((4, 32)),
            interpret=True,
        )
