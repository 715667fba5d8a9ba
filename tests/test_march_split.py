"""Split shadow march (refinement kernel + final-sweep kernel) vs the
monolithic fused_shadow_tau, in Pallas interpret mode on CPU.

The split path must be numerically IDENTICAL to the monolith — same
refinement schedule (fused_importance_z's machinery is byte-identical per
construction), same final-sweep math — its only purpose is a smaller
per-kernel VMEM working set so each half fits larger ray blocks
(PROFILE.md "March-kernel block_rays sweep": the monolith caps at
block_rays=16)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode twin tests are CPU-only",
)

from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from nrhints_tpu.kernels.march import fused_shadow_tau


@pytest.fixture(scope="module")
def setup():
    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 24  # not a multiple of either block size: exercises padding
    o = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32)) * 0.1
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (b, 64))
    sdist = jnp.full((b, 1), 2.0 / 64)
    return cfg, params, o, d, z0, sdist


def test_split_matches_monolith(setup):
    cfg, params, o, d, z0, sdist = setup
    args = (params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(0.7))
    tau_mono = fused_shadow_tau(*args, block_rays=16, interpret=True)
    tau_split = fused_shadow_tau(
        *args, block_rays=16, interpret=True, split=True, refine_block_rays=32
    )
    np.testing.assert_allclose(
        np.asarray(tau_split), np.asarray(tau_mono), atol=1e-6
    )
    assert tau_split.shape == (24, 1)
    t = np.asarray(tau_split)
    assert (t >= 0).all() and (t <= 1 + 1e-5).all()


def test_split_block_sizes_agree(setup):
    """Block geometry must not change results (padding rays are dropped)."""
    cfg, params, o, d, z0, sdist = setup
    args = (params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(1.0))
    t1 = fused_shadow_tau(
        *args, block_rays=8, interpret=True, split=True, refine_block_rays=8
    )
    t2 = fused_shadow_tau(
        *args, block_rays=32, interpret=True, split=True, refine_block_rays=64
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_xla_sweep_and_final_match_pallas(setup):
    """sweep_impl='xla' / final_impl='xla' run the SAME jnp programs as the
    sweep/final kernels, just compiled by XLA on the full batch — results
    must match the all-Pallas split path."""
    cfg, params, o, d, z0, sdist = setup
    args = (params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(0.7))
    tau_p = fused_shadow_tau(
        *args, block_rays=16, interpret=True, split=True, refine_block_rays=32
    )
    for kw in (
        {"sweep_impl": "xla"},
        {"final_impl": "xla"},
        {"sweep_impl": "xla", "final_impl": "xla"},
    ):
        tau_x = fused_shadow_tau(
            *args, block_rays=16, interpret=True, split=True,
            refine_block_rays=32, **kw
        )
        np.testing.assert_allclose(
            np.asarray(tau_x), np.asarray(tau_p), atol=1e-6, err_msg=str(kw)
        )


def test_importance_xla_sweep_matches_monolith(setup):
    from nrhints_tpu.kernels.march import fused_importance_z

    cfg, params, o, d, z0, _ = setup
    z_mono = fused_importance_z(params, cfg, o, d, z0, interpret=True)
    z_xla = fused_importance_z(
        params, cfg, o, d, z0, interpret=True, split=True, sweep_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(z_xla), np.asarray(z_mono), atol=1e-6)


def test_rank_merge_requires_power_of_two_n_new(setup):
    from nrhints_tpu.kernels.march import fused_importance_z

    cfg, params, o, d, _, _ = setup
    z0_bad = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 128 - 4 * 12), (24, 128 - 4 * 12))
    with pytest.raises(ValueError, match="power-of-two"):
        fused_importance_z(
            params, cfg, o, d, z0_bad, n_new=12, interpret=True, merge="rank"
        )


def test_xla_impls_through_renderer(setup):
    """march_sweep_impl='xla' + shadow_final_impl='xla' through render_rays
    match the all-Pallas configuration."""
    from nrhints_tpu.core.structs import RayBundle
    from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
    from nrhints_tpu.render.renderer import (
        ModelConfig,
        RendererConfig,
        init_model_params,
        render_rays,
    )

    rng = np.random.default_rng(5)
    n = 8
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = -2.5
    dirs = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    dirs[:, 2] += 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mid = -np.sum(origins * dirs, -1, keepdims=True)
    rays = RayBundle(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        pl_positions=jnp.asarray(np.tile([[1.0, 2.0, 2.0]], (n, 1)).astype(np.float32)),
        nears=jnp.asarray(mid - 1.0),
        fars=jnp.asarray(mid + 1.0),
    )

    def model(**render_kw) -> ModelConfig:
        return ModelConfig(
            sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
            reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
            renderer=RendererConfig(
                fused_kernels="on",
                fused_interpret=True,
                shadow_split=True,
                shadow_block_rays=8,
                shadow_refine_block_rays=16,
                **render_kw,
            ),
        )

    params = init_model_params(jax.random.PRNGKey(0), model())
    out_p = render_rays(params, model(), rays, background_rgb=jnp.zeros((1, 3)))
    out_x = render_rays(
        params,
        model(march_sweep_impl="xla", shadow_final_impl="xla"),
        rays,
        background_rgb=jnp.zeros((1, 3)),
    )
    np.testing.assert_allclose(np.asarray(out_x.rgb), np.asarray(out_p.rgb), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_x.visibilities), np.asarray(out_p.visibilities), atol=1e-6
    )


def test_split_through_renderer(setup):
    """shadow_split=True through render_rays matches shadow_split=False."""
    from nrhints_tpu.core.structs import RayBundle
    from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
    from nrhints_tpu.render.renderer import (
        ModelConfig,
        RendererConfig,
        init_model_params,
        render_rays,
    )

    rng = np.random.default_rng(3)
    n = 8
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = -2.5
    dirs = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    dirs[:, 2] += 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mid = -np.sum(origins * dirs, -1, keepdims=True)
    rays = RayBundle(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        pl_positions=jnp.asarray(np.tile([[1.0, 2.0, 2.0]], (n, 1)).astype(np.float32)),
        nears=jnp.asarray(mid - 1.0),
        fars=jnp.asarray(mid + 1.0),
    )

    def model(split: bool) -> ModelConfig:
        return ModelConfig(
            sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
            reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
            renderer=RendererConfig(
                fused_kernels="on",
                fused_interpret=True,
                shadow_split=split,
                shadow_block_rays=8,
                shadow_refine_block_rays=16,
            ),
        )

    params = init_model_params(jax.random.PRNGKey(0), model(False))
    out_mono = render_rays(params, model(False), rays, background_rgb=jnp.zeros((1, 3)))
    out_split = render_rays(params, model(True), rays, background_rgb=jnp.zeros((1, 3)))
    np.testing.assert_allclose(
        np.asarray(out_split.rgb), np.asarray(out_mono.rgb), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_split.visibilities),
        np.asarray(out_mono.visibilities),
        atol=1e-6,
    )
