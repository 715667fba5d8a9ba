"""2-D ('data','sample') mesh: sample-axis (context-parallel) sharding.

SURVEY.md §5.7: the honest "sequence length" of this workload is the
per-ray sample axis, and its natural parallelism is sharding the shadow
march's samples across chips.  The reference keeps the global batch at 512
rays regardless of world size (``trainer/trainer.py:118`` in
iamNCJ/NRHints), so on a mesh larger than the ray count pure ray-DP
strands devices; the 2-D mesh keeps them busy:

  * the fused core flatten-shards its [B*S] pointwise calls over BOTH axes;
  * the march kernels flatten-shard rays over both axes when the batch
    divides the mesh, falling back to 'data'-only when it doesn't;
  * the jnp shadow march gains a sample-sharded shard_map path
    (``renderer._shadow_transmittance_sample_sharded``) that splits each
    round's SDF sweep over 'sample' and all-gathers the tiny per-ray value
    vectors — numerically identical to the unsharded jnp path.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="2-D-mesh tests run on the virtual CPU mesh",
)

from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.parallel import mesh as mesh_lib
from nrhints_tpu.core.sampling import stratified_z_vals
from nrhints_tpu.render.renderer import (
    _importance_sample_z,
    _shadow_transmittance,
    init_model_params,
    render_rays,
)
from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step
from tests.data_utils import make_synthetic_scene
from tests.test_shard_fused import flagship_tiny_config, make_rays


@pytest.fixture(scope="module")
def mesh2d():
    return mesh_lib.make_mesh(2, sample_axis_size=4)


@pytest.fixture(scope="module")
def cfg_params_off():
    cfg = flagship_tiny_config(fused_kernels="off")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_make_mesh_2d_shape():
    m = mesh_lib.make_mesh(2, sample_axis_size=4)
    assert m.axis_names == ("data", "sample")
    assert m.shape["data"] == 2 and m.shape["sample"] == 4
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(4, sample_axis_size=4)  # 16 > 8 devices


def test_sample_sharded_shadow_matches_unsharded(mesh2d, cfg_params_off):
    cfg, params = cfg_params_off
    rng = np.random.default_rng(2)
    B = 12  # divides 'data' (2), not the full mesh (8)
    pls = jnp.asarray(np.tile([[1.5, 2.0, 2.0]], (B, 1)).astype(np.float32))
    tp = jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32))

    tau_ref = _shadow_transmittance(params, cfg, pls, tp, 1.0, None)

    rep = mesh_lib.replicated_sharding(mesh2d)
    sh = NamedSharding(mesh2d, P("data"))
    p = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    tau = jax.jit(
        lambda p, a, b: _shadow_transmittance(p, cfg, a, b, 1.0, None, mesh2d)
    )(p, jax.device_put(pls, sh), jax.device_put(tp, sh))

    assert tau.sharding.is_equivalent_to(sh, tau.ndim)
    # Same per-point math, gathered in axis order -> matches the unsharded
    # jnp path to float-level noise (XLA tiles the sliced MLP dots
    # differently per shape; measured max deviation 2e-6).
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref), atol=1e-5)


def test_sample_sharded_importance_matches_unsharded(mesh2d, cfg_params_off):
    cfg, params = cfg_params_off
    rays = make_rays(12, seed=3)
    z0 = stratified_z_vals(rays.nears, rays.fars, cfg.renderer.n_samples)

    z_ref = _importance_sample_z(params, cfg, rays.origins, rays.directions, z0)

    rep = mesh_lib.replicated_sharding(mesh2d)
    sh = NamedSharding(mesh2d, P("data"))
    p = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    z = jax.jit(
        lambda p, o, d, z: _importance_sample_z(p, cfg, o, d, z, mesh2d)
    )(p, jax.device_put(rays.origins, sh), jax.device_put(rays.directions, sh),
      jax.device_put(z0, sh))

    assert z.sharding.is_equivalent_to(sh, z.ndim)
    z, z_ref = np.asarray(z), np.asarray(z_ref)
    assert (np.diff(z, axis=-1) >= -1e-5).all()
    # The inverse-CDF is discontinuous in the sdf values, and the sliced
    # MLP dots differ from the full-batch ones by ~1e-7 (XLA tiling), so a
    # few samples shift bins (measured: 1.8% of entries, <= 0.03 on a 2.0
    # range) — same convention as the fused-kernel z comparison in
    # test_shard_fused.py.
    np.testing.assert_allclose(z, z_ref, atol=5e-2)
    assert np.abs(z - z_ref).mean() < 5e-3


@pytest.mark.slow
def test_render_rays_2d_mesh_jnp_matches_unsharded(mesh2d, cfg_params_off):
    cfg, params = cfg_params_off
    rays = make_rays(12, seed=4)
    out_ref = render_rays(params, cfg, rays, background_rgb=jnp.zeros((1, 3)))
    out = render_rays(
        params, cfg, rays, background_rgb=jnp.zeros((1, 3)), mesh=mesh2d
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb), np.asarray(out_ref.rgb), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.visibilities), np.asarray(out_ref.visibilities), atol=1e-5
    )


@pytest.mark.slow  # round-5 fast-tier triage (57 s; 2-D mesh coverage
# stays fast via trainer_with_sample_axis / sample_sharded_shadow /
# train_step_2d_mesh)
def test_render_rays_2d_mesh_fused_flatten_shards(mesh2d):
    """Batch divides the full mesh -> the fused kernels flatten-shard rays
    over BOTH axes and match the unsharded fused path exactly."""
    cfg = flagship_tiny_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    rays = make_rays(16, seed=5)  # 16 % 8 == 0
    out_ref = render_rays(params, cfg, rays, background_rgb=jnp.zeros((1, 3)))
    out = render_rays(
        params, cfg, rays, background_rgb=jnp.zeros((1, 3)), mesh=mesh2d
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb), np.asarray(out_ref.rgb), atol=1e-6
    )


@pytest.mark.slow
def test_render_rays_2d_mesh_fused_small_batch(mesh2d):
    """Batch covers only 'data': BOTH marches switch to their sample-sharded
    jnp paths (full-mesh occupancy instead of a 'sample'-replicated kernel);
    the fused core still flatten-shards its [B*S] calls over both axes.
    Output matches the all-jnp path at core-kernel tolerances."""
    cfg = flagship_tiny_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    rays = make_rays(12, seed=6)  # 12 % 8 != 0, 12 % 2 == 0
    out = render_rays(
        params, cfg, rays, background_rgb=jnp.zeros((1, 3)), mesh=mesh2d
    )
    cfg_off = dataclasses.replace(
        cfg, renderer=dataclasses.replace(cfg.renderer, fused_kernels="off")
    )
    out_ref = render_rays(params, cfg_off, rays, background_rgb=jnp.zeros((1, 3)))
    rgb, rgb_ref = np.asarray(out.rgb), np.asarray(out_ref.rgb)
    assert np.isfinite(rgb).all()
    np.testing.assert_allclose(rgb, rgb_ref, atol=5e-3)


def test_trainer_with_sample_axis(tmp_path):
    """Config plumbing: parallel.sample_axis_size=2 builds the 2-D mesh and
    the full Trainer (train loop + final eval with its flattened per-host
    eval mesh) runs on it end-to-end."""
    import json

    from nrhints_tpu.configs.config import ParallelConfig
    from nrhints_tpu.train.trainer import Trainer
    from tests.test_trainer_e2e import e2e_config

    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene"))
    cfg = e2e_config(tmp_path / "runs", end_iter=10)
    cfg = dataclasses.replace(cfg, parallel=ParallelConfig(sample_axis_size=2))
    trainer = Trainer(cfg, scene=scene)
    assert trainer.mesh.axis_names == ("data", "sample")
    assert trainer.mesh.shape["data"] == 4 and trainer.mesh.shape["sample"] == 2
    trainer.run()
    assert trainer.global_step == 10
    lines = [
        json.loads(l)
        for l in (trainer.log_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_logs = [l for l in lines if "loss" in l]
    assert train_logs and all(np.isfinite(l["loss"]) for l in train_logs)


@pytest.mark.slow
def test_train_step_2d_mesh_fused_matches_single_device(mesh2d, tmp_path):
    """FUSED-path (interpret) train step on the 2-D mesh with the batch
    divisible by the FULL mesh (16 % 8 == 0, so the fused kernels
    flatten-shard over both axes): the custom-VJP backward psum over
    ('data','sample') must reproduce the 1-device update.  (Advisor r3:
    the jnp variant below left the fused 2-D backward smoke-tested only.)"""
    from nrhints_tpu.camera.rays import ray_generator_init

    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene"))
    model = dataclasses.replace(
        flagship_tiny_config(),  # fused on, interpret mode
        batch_size=16,
        warm_up_end=10,
        end_iter=100,
        anneal_end=50,
    )
    cfg = SystemConfig(model=model)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batch_np = dm.next_train_batch()
    key = jax.random.PRNGKey(7)

    def setup(m):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "renderer": init_model_params(k1, cfg.model),
            "raygen": ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[0],
        }
        buffers = ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[1]
        opt = make_optimizer(cfg)
        state = init_train_state(params, opt)
        if m is not None:
            state = mesh_lib.replicate(m, state)
            buffers = mesh_lib.replicate(m, buffers)
        return state, buffers, opt

    state1, buffers1, opt1 = setup(None)
    step1 = make_train_step(cfg, scene.camera, buffers1, opt1, donate=False)
    s1, m1 = step1(state1, jax.device_put(batch_np), key)

    state2, buffers2, opt2 = setup(mesh2d)
    step2 = make_train_step(cfg, scene.camera, buffers2, opt2, donate=False, mesh=mesh2d)
    s2, m2 = step2(state2, mesh_lib.shard_batch(mesh2d, batch_np), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_train_step_2d_mesh_matches_single_device(mesh2d, tmp_path):
    """Full jnp train step on the 2-D mesh (sample-sharded shadow inside the
    grad graph) reproduces the 1-device update."""
    from nrhints_tpu.camera.rays import ray_generator_init

    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene"))
    model = dataclasses.replace(
        flagship_tiny_config(fused_kernels="off"),
        batch_size=12,
        warm_up_end=10,
        end_iter=100,
        anneal_end=50,
    )
    cfg = SystemConfig(model=model)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batch_np = dm.next_train_batch()
    key = jax.random.PRNGKey(7)

    def setup(m):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "renderer": init_model_params(k1, cfg.model),
            "raygen": ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[0],
        }
        buffers = ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[1]
        opt = make_optimizer(cfg)
        state = init_train_state(params, opt)
        if m is not None:
            state = mesh_lib.replicate(m, state)
            buffers = mesh_lib.replicate(m, buffers)
        return state, buffers, opt

    state1, buffers1, opt1 = setup(None)
    step1 = make_train_step(cfg, scene.camera, buffers1, opt1, donate=False)
    s1, m1 = step1(state1, jax.device_put(batch_np), key)

    state2, buffers2, opt2 = setup(mesh2d)
    step2 = make_train_step(cfg, scene.camera, buffers2, opt2, donate=False, mesh=mesh2d)
    s2, m2 = step2(state2, mesh_lib.shard_batch(mesh2d, batch_np), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
