"""Fused Pallas kernel tests: each kernel against its jnp twin.

These need real TPU hardware (Mosaic compile); they are skipped on the CPU
test mesh.  Run them with:

    NRHINTS_TPU_TESTS=1 python -m pytest tests/test_kernels.py -q
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused kernels need the TPU backend"
)

from nrhints_tpu.core.sampling import stratified_z_vals
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init, sdf_only
from nrhints_tpu.fields.variance import inv_s_from_params, variance_init


@pytest.fixture(scope="module")
def setup():
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    vparams = variance_init()
    B = 128
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([[0, 0, -2.5]], (B, 1)).astype(np.float32))
    d = rng.normal(0, 0.05, (B, 3))
    d[:, 2] += 1.0
    d /= np.linalg.norm(d, -1, keepdims=True)
    rays_d = jnp.asarray(d.astype(np.float32))
    return cfg, params, vparams, B, rays_o, rays_d


def test_fused_importance_matches_jnp_twin(setup):
    from nrhints_tpu.kernels.march import fused_importance_z
    from nrhints_tpu.render.renderer import ModelConfig, _importance_sample_z
    import dataclasses

    cfg, params, _, B, rays_o, rays_d = setup
    mid = -jnp.sum(rays_o * rays_d, -1, keepdims=True)
    z0 = stratified_z_vals(mid - 1.0, mid + 1.0, 64)

    zk = np.asarray(fused_importance_z(params, cfg, rays_o, rays_d, z0))
    mcfg = ModelConfig()
    mcfg = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="off")
    )
    zj = np.asarray(_importance_sample_z({"sdf": params}, mcfg, rays_o, rays_d, z0))
    assert zk.shape == (B, 128)
    assert (np.diff(zk, axis=-1) >= -1e-5).all(), "fused z must be sorted"
    np.testing.assert_allclose(zk, zj, atol=2e-2)
    assert np.abs(zk - zj).mean() < 2e-3


def test_fused_shadow_matches_jnp_twin(setup):
    import dataclasses

    from nrhints_tpu.kernels.march import fused_shadow_tau
    from nrhints_tpu.render.renderer import ModelConfig, _shadow_transmittance

    cfg, params, vparams, B, _, _ = setup
    rng = np.random.default_rng(1)
    pls = jnp.asarray(np.tile([[1.5, 2.0, 2.0]], (B, 1)).astype(np.float32))
    tp = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))
    full = {"sdf": params, "variance": vparams}

    mcfg = ModelConfig()
    mcfg_off = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="off")
    )
    tau_ref = np.asarray(_shadow_transmittance(full, mcfg_off, pls, tp, 1.0, None))

    d = tp - pls
    light_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray_d = d / light_norm
    z0 = jnp.linspace(0.0, 1.0, 64)[None, :] * light_norm * (1.0 - 1e-2)
    tau_k = np.asarray(
        fused_shadow_tau(
            params, cfg, pls, ray_d, z0, light_norm / 64,
            inv_s_from_params(vparams), 1.0,
        )
    )
    assert tau_k.shape == (B, 1)
    # (1 + 1e-7)^127 slightly exceeds 1 — the reference's cumprod epsilon
    # does the same (models/neus_hint_model.py:429-430).
    assert (tau_k >= 0).all() and (tau_k <= 1 + 1e-4).all()
    np.testing.assert_allclose(tau_k, tau_ref, atol=5e-3)


def test_fused_shadow_split_matches_monolith(setup):
    """Split (refinement + final-sweep kernels) vs the monolithic shadow
    kernel on hardware — identical math, different blocking (the split
    halves fit block sizes the monolith's VMEM cannot)."""
    from nrhints_tpu.kernels.march import fused_shadow_tau

    cfg, params, vparams, B, _, _ = setup
    rng = np.random.default_rng(2)
    pls = jnp.asarray(np.tile([[1.5, 2.0, 2.0]], (B, 1)).astype(np.float32))
    tp = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))
    d = tp - pls
    light_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray_d = d / light_norm
    z0 = jnp.linspace(0.0, 1.0, 64)[None, :] * light_norm * (1.0 - 1e-2)
    args = (params, cfg, pls, ray_d, z0, light_norm / 64,
            inv_s_from_params(vparams), 1.0)
    tau_mono = np.asarray(fused_shadow_tau(*args))
    # Shipping block sizes (PROFILE.md "Split shadow march"): the final
    # sweep's VMEM ceiling is block 16 — block 32 fails the Mosaic compile
    # (dual-stream [BR*128, 256] activations), which this test originally
    # used and which the round-3 hardware run caught.
    tau_split = np.asarray(
        fused_shadow_tau(*args, split=True, block_rays=16, refine_block_rays=32)
    )
    np.testing.assert_allclose(tau_split, tau_mono, atol=1e-5)


def test_fused_render_matches_jnp_render(setup):
    """Full render with fused kernels on vs off: rgb should agree closely."""
    import dataclasses

    from nrhints_tpu.core.structs import RayBundle
    from nrhints_tpu.render.renderer import ModelConfig, init_model_params, render_rays

    _, _, _, B, rays_o, rays_d = setup
    mcfg = ModelConfig()
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    mid = -jnp.sum(rays_o * rays_d, -1, keepdims=True)
    rays = RayBundle(
        origins=rays_o,
        directions=rays_d,
        pl_positions=jnp.tile(jnp.array([[1.5, 2.0, 2.0]]), (B, 1)),
        nears=mid - 1.0,
        fars=mid + 1.0,
    )
    cfg_on = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="on")
    )
    cfg_off = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="off")
    )
    out_on = jax.jit(lambda p, r: render_rays(p, cfg_on, r, background_rgb=jnp.ones((1, 3))))(params, rays)
    out_off = jax.jit(lambda p, r: render_rays(p, cfg_off, r, background_rgb=jnp.ones((1, 3))))(params, rays)
    rgb_on, rgb_off = np.asarray(out_on.rgb), np.asarray(out_off.rgb)
    np.testing.assert_allclose(rgb_on, rgb_off, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out_on.visibilities), np.asarray(out_off.visibilities), atol=5e-3
    )


def test_fused_sdf_core_matches_xla(setup):
    """Fused with-grad SDF core (kernels/core_mlp.py) vs the XLA path on the
    full-size field.  f32 dots: tight; bf16 dots (the TPU default, matching
    XLA DEFAULT matmul precision): loose."""
    from nrhints_tpu.fields.sdf import sdf_value_feat_grad
    from nrhints_tpu.kernels.core_mlp import fused_sdf_value_feat_grad

    cfg, params, _, B, rays_o, rays_d = setup
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32)) * 0.4

    # True-f32 XLA reference: on TPU, XLA's DEFAULT precision rounds f32
    # dot operands to bf16, so pin HIGHEST for the exact comparison.
    with jax.default_matmul_precision("highest"):
        s0, f0, g0 = jax.jit(lambda: sdf_value_feat_grad(params, cfg, x))()
    s1, f1, g1 = jax.jit(
        lambda: fused_sdf_value_feat_grad(params, cfg, x, compute_dtype="float32")
    )()
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=2e-3)

    s2, f2, g2 = jax.jit(lambda: fused_sdf_value_feat_grad(params, cfg, x))()
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s2), atol=2e-2)
    # normals: compare directions (the eikonal keeps |g| ~ 1)
    cos = np.sum(np.asarray(g0) * np.asarray(g2), -1) / (
        np.linalg.norm(np.asarray(g0), axis=-1) * np.linalg.norm(np.asarray(g2), axis=-1) + 1e-9
    )
    assert cos.min() > 0.99


def test_fused_core_train_grads_match_xla(setup):
    """d(loss)/d(params) through the full fused render core vs the XLA path
    (both at their TPU-default matmul precision)."""
    import dataclasses

    from nrhints_tpu.core.structs import RayBundle
    from nrhints_tpu.render.renderer import ModelConfig, init_model_params, render_rays

    _, _, _, B, rays_o, rays_d = setup
    mcfg = ModelConfig()
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    mid = -jnp.sum(rays_o * rays_d, -1, keepdims=True)
    rays = RayBundle(
        origins=rays_o,
        directions=rays_d,
        pl_positions=jnp.tile(jnp.array([[1.5, 2.0, 2.0]]), (B, 1)),
        nears=mid - 1.0,
        fars=mid + 1.0,
    )

    def loss_with(cfg):
        def fn(p):
            out = render_rays(p, cfg, rays, background_rgb=jnp.ones((1, 3)))
            eik = jnp.mean((jnp.linalg.norm(out.analytic_normals, axis=-1) - 1.0) ** 2)
            return jnp.mean(out.rgb) + 0.1 * eik

        return fn

    cfg_on = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="on")
    )
    cfg_off = dataclasses.replace(
        mcfg, renderer=dataclasses.replace(mcfg.renderer, fused_kernels="off")
    )
    g_on = jax.jit(jax.grad(loss_with(cfg_on)))(params)
    g_off = jax.jit(jax.grad(loss_with(cfg_off)))(params)
    for l0, l1 in zip(jax.tree_util.tree_leaves(g_off), jax.tree_util.tree_leaves(g_on)):
        a, b = np.asarray(l0), np.asarray(l1)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.08, (np.abs(a - b).max(), scale)


def test_stash_backward_matches_recompute_on_tpu(setup):
    """Real-Mosaic stash backward vs the recompute backward: same gradients
    (both bf16-operand; the stash adds bf16-activation reads — tolerance as
    in tests/test_core_stash.py, but on hardware)."""
    from nrhints_tpu.kernels.core_mlp import fused_sdf_value_feat_grad

    cfg, params, _, B, rays_o, rays_d = setup
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32)) * 0.4

    def loss(p, backward):
        s, f, g = fused_sdf_value_feat_grad(p, cfg, x, backward=backward)
        return jnp.sum(s) + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    g_r = jax.jit(jax.grad(lambda p: loss(p, "recompute")))(params)
    g_s = jax.jit(jax.grad(lambda p: loss(p, "stash")))(params)
    # Measured on v5e (2026-08-21): worst leaf 4.3e-3 of scale — real-Mosaic
    # bf16 rounding is coarser than interpret mode's (1.2e-3) but far inside
    # the established bf16 fused-vs-XLA band (8e-2 in
    # test_fused_core_train_grads_match_xla).  The f32-stash interpret tests
    # (tests/test_core_stash.py) pin the schedule itself exactly.
    for a, b in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_s)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) <= 1e-2 * scale


def test_rank_merge_matches_bitonic_on_tpu(setup):
    """Real-Mosaic rank merge vs bitonic through fused_importance_z."""
    from nrhints_tpu.kernels.march import fused_importance_z

    cfg, params, _, B, rays_o, rays_d = setup
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (B, 64))
    z_bit = jax.jit(
        lambda: fused_importance_z(params, cfg, rays_o, rays_d, z0)
    )()
    z_rank = jax.jit(
        lambda: fused_importance_z(params, cfg, rays_o, rays_d, z0, merge="rank")
    )()
    np.testing.assert_allclose(np.asarray(z_rank), np.asarray(z_bit), atol=1e-5)
