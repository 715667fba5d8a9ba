"""Training-layer tests: optimizer/schedule, train step on a sharded mesh,
end-to-end tiny-scene training, checkpoint resume."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrhints_tpu.camera.rays import RayGeneratorConfig, ray_generator_init
from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.data.manager import DataManager, DataManagerConfig
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.parallel import mesh as mesh_lib
from nrhints_tpu.render.renderer import ModelConfig, RendererConfig, init_model_params
from nrhints_tpu.train.step import (
    init_train_state,
    lr_factor_schedule,
    make_optimizer,
    make_train_step,
    make_train_step_scan,
)
from tests.data_utils import make_synthetic_scene


def tiny_system_config(**overrides) -> SystemConfig:
    model = ModelConfig(
        sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
        reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
        renderer=RendererConfig(
            n_samples=16,
            n_importance_samples=16,
            n_shadow_samples=16,
            n_shadow_importance_samples=16,
        ),
        batch_size=32,
        warm_up_end=10,
        end_iter=100,
        anneal_end=50,
    )
    return SystemConfig(model=model, **overrides)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = make_synthetic_scene(tmp_path_factory.mktemp("scene"))
    return parse_load_nr_data(d)


def test_lr_factor_schedule():
    f = lr_factor_schedule(warm_up_end=100, end_iter=1000, alpha=0.05)
    np.testing.assert_allclose(float(f(0)), 0.0)
    np.testing.assert_allclose(float(f(50)), 0.5)
    np.testing.assert_allclose(float(f(100)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(f(1000)), 0.05, atol=1e-6)
    mid = float(f(550))
    np.testing.assert_allclose(mid, (1 + 0.05) / 2, atol=1e-6)


def _setup(cfg, scene, mesh=None):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    renderer_params = init_model_params(k1, cfg.model)
    raygen_params, buffers = ray_generator_init(
        k2, cfg.ray_generator, scene.total_image_num
    )
    params = {"renderer": renderer_params, "raygen": raygen_params}
    opt = make_optimizer(cfg)
    state = init_train_state(params, opt)
    if mesh is not None:
        state = mesh_lib.replicate(mesh, state)
        buffers = mesh_lib.replicate(mesh, buffers)
    return state, buffers, opt


@pytest.mark.slow
def test_train_step_decreases_loss(scene):
    cfg = tiny_system_config()
    state, buffers, opt = _setup(cfg, scene)
    step_fn = make_train_step(cfg, scene.camera, buffers, opt)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(30):
        batch = jax.device_put(dm.next_train_batch())
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 30
    # With warmup the first steps barely move; compare early vs late means.
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_step_sharded_matches_single_device(scene):
    """DP over the 8-device CPU mesh must produce the same update as a
    single device (same global batch, replicated params)."""
    cfg = tiny_system_config()
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batch_np = dm.next_train_batch()
    key = jax.random.PRNGKey(7)

    state1, buffers1, opt1 = _setup(cfg, scene)
    step1 = make_train_step(cfg, scene.camera, buffers1, opt1, donate=False)
    s1, m1 = step1(state1, jax.device_put(batch_np), key)

    mesh = mesh_lib.make_mesh(8)
    state8, buffers8, opt8 = _setup(cfg, scene, mesh)
    step8 = make_train_step(cfg, scene.camera, buffers8, opt8, donate=False)
    s8, m8 = step8(state8, mesh_lib.shard_batch(mesh, batch_np), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_train_step_with_cam_opt(scene):
    cfg = tiny_system_config(
        ray_generator=RayGeneratorConfig(cam_opt_mode="SO3xR3", pl_opt=True)
    )
    state, buffers, opt = _setup(cfg, scene)
    step_fn = make_train_step(cfg, scene.camera, buffers, opt)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    p0 = np.asarray(state.params["raygen"]["cam_pose_adjustment"]).copy()
    for i in range(3):
        batch = jax.device_put(dm.next_train_batch())
        state, _ = step_fn(state, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
    p1 = np.asarray(state.params["raygen"]["cam_pose_adjustment"])
    assert not np.array_equal(p0, p1), "pose table should receive updates"
    assert np.isfinite(p1).all()


def test_geometry_warmup_step_variant(scene):
    cfg_model = dataclasses.replace(tiny_system_config().model, geometry_warmup_end=10)
    cfg = dataclasses.replace(tiny_system_config(), model=cfg_model)
    state, buffers, opt = _setup(cfg, scene)
    step_warm = make_train_step(cfg, scene.camera, buffers, opt, geometry_warmup=True)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batch = jax.device_put(dm.next_train_batch())
    state, metrics = step_warm(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_train_step_scan_matches_single_steps(scene):
    """K steps in one lax.scan dispatch must reproduce K single-step
    dispatches exactly (same batches, same per-step folded keys)."""
    K = 4
    cfg = tiny_system_config()
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batches = [dm.next_train_batch() for _ in range(K)]
    key = jax.random.PRNGKey(3)

    state_a, buffers_a, opt_a = _setup(cfg, scene)
    step1 = make_train_step(cfg, scene.camera, buffers_a, opt_a, donate=False)
    for i, b in enumerate(batches):
        state_a, m_a = step1(state_a, jax.device_put(b), jax.random.fold_in(key, i))

    state_b, buffers_b, opt_b = _setup(cfg, scene)
    scan_fn = make_train_step_scan(
        cfg, scene.camera, buffers_b, opt_b, n_steps=K, donate=False
    )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    state_b, m_b = scan_fn(state_b, jax.device_put(stacked), key)

    assert int(state_b.step) == K
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_donated_step_matches_undonated(scene):
    """Production jits with donate_argnums=(0,) while the equivalence tests
    above construct donate=False steps — this closes that gap (SURVEY §5.2:
    donation/aliasing test).  Three donated steps must produce exactly the
    params of three undonated steps; an aliasing bug (an input buffer reused
    while still feeding another output) would diverge here."""
    cfg = tiny_system_config()
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batches = [dm.next_train_batch() for _ in range(3)]
    key = jax.random.PRNGKey(11)

    state_d, buffers_d, opt_d = _setup(cfg, scene)
    step_d = make_train_step(cfg, scene.camera, buffers_d, opt_d, donate=True)
    state_u, buffers_u, opt_u = _setup(cfg, scene)
    step_u = make_train_step(cfg, scene.camera, buffers_u, opt_u, donate=False)

    for i, b in enumerate(batches):
        b_dev = jax.device_put(b)
        k = jax.random.fold_in(key, i)
        state_d, m_d = step_d(state_d, b_dev, k)
        state_u, m_u = step_u(state_u, b_dev, k)

    np.testing.assert_allclose(float(m_d["loss"]), float(m_u["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_d.params),
        jax.tree_util.tree_leaves(state_u.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_key_stream_host_invariant(scene):
    """Cross-host pRNG discipline (SURVEY §5.2/§7.3): the per-step render
    key is fold_in(train_key, global_step) — a pure function of the config
    seed and the step counter, never of process_index.  The host-dependent
    randomness lives exclusively in the pixel SAMPLER (rank-decorrelated
    seeds, rank-disjoint draws — test_data.py), so any host count replays
    the identical key stream over its share of the global batch.
    test_multihost.py proves the composition end-to-end (params bitwise in
    lockstep across 2 processes); this pins the key-derivation invariant
    itself."""
    import jax.numpy as jnp

    seed = 42
    key_a = jax.random.split(jax.random.PRNGKey(seed), 3)[2]  # trainer derivation
    key_b = jax.random.split(jax.random.PRNGKey(seed), 3)[2]
    np.testing.assert_array_equal(np.asarray(key_a), np.asarray(key_b))
    steps = [np.asarray(jax.random.fold_in(key_a, s)) for s in range(4)]
    assert len({tuple(k.ravel()) for k in steps}) == 4  # distinct per step

    # The scanned variant folds from the CARRIED step counter, so a run
    # chunked as K-step dispatches replays the same stream (the vmap inside
    # make_train_step_scan) — spot-check the fold identity it relies on.
    k_chunk = np.asarray(
        jax.vmap(lambda i: jax.random.fold_in(key_a, i))(jnp.arange(2, 4))
    )
    np.testing.assert_array_equal(k_chunk, np.stack(steps[2:4]))


@pytest.mark.slow
def test_scaled_batch_lr_rule(scene):
    """scale_global_batch recipe (BASELINE.md §"Scaling plan"): at equal
    rays-seen, an 8x batch with linear lr compensation must track the
    unscaled loss trajectory, and must beat the uncompensated run."""
    from nrhints_tpu.configs.config import ParallelConfig
    from nrhints_tpu.train.step import batch_scale_lr_factor

    def run(batch, steps, rule):
        cfg = tiny_system_config(parallel=ParallelConfig(batch_scale_lr_rule=rule))
        mesh = mesh_lib.make_mesh(8)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        params = {
            "renderer": init_model_params(k1, cfg.model),
            "raygen": ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[0],
        }
        buffers = ray_generator_init(k2, cfg.ray_generator, scene.total_image_num)[1]
        opt = make_optimizer(cfg, lr_scale=batch_scale_lr_factor(cfg, batch))
        state = mesh_lib.replicate(mesh, init_train_state(params, opt))
        buffers = mesh_lib.replicate(mesh, buffers)
        step = make_train_step(cfg, scene.camera, buffers, opt)
        dm = DataManager(scene, batch_size=batch)
        losses = []
        for i in range(steps):
            b = mesh_lib.shard_batch(mesh, dm.next_train_batch())
            state, m = step(state, b, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    base = run(32, 640, "none")[-50:].mean()  # 20,480 rays seen
    scaled_linear = run(256, 80, "linear")[-8:].mean()  # same rays seen
    scaled_none = run(256, 80, "none")[-8:].mean()

    # Measured: linear lands within ~6% of the unscaled trajectory
    # (0.103 vs 0.098); uncompensated lags ~60% (0.156).
    assert scaled_linear < 1.25 * base, (scaled_linear, base)
    assert scaled_none > 1.15 * scaled_linear, (scaled_none, scaled_linear)


def test_batch_scale_lr_factor_rules():
    from nrhints_tpu.configs.config import ParallelConfig
    from nrhints_tpu.train.step import batch_scale_lr_factor

    def cfg(rule):
        return tiny_system_config(parallel=ParallelConfig(batch_scale_lr_rule=rule))

    b = tiny_system_config().model.batch_size
    assert batch_scale_lr_factor(cfg("linear"), b) == 1.0
    assert batch_scale_lr_factor(cfg("linear"), 8 * b) == 8.0
    np.testing.assert_allclose(batch_scale_lr_factor(cfg("sqrt"), 8 * b), 8 ** 0.5)
    assert batch_scale_lr_factor(cfg("none"), 8 * b) == 1.0
    with pytest.raises(ValueError):
        batch_scale_lr_factor(cfg("cube"), 8 * b)


def test_train_step_scan_sharded(scene):
    """The scanned step composes with the data mesh: stacked batches are
    sharded on the ray axis, params replicated."""
    K = 2
    cfg = tiny_system_config()
    mesh = mesh_lib.make_mesh(8)
    state, buffers, opt = _setup(cfg, scene, mesh)
    scan_fn = make_train_step_scan(cfg, scene.camera, buffers, opt, n_steps=K)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    batches = [dm.next_train_batch() for _ in range(K)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    stacked = mesh_lib.shard_batch(mesh, stacked, batch_axis=1)
    state, metrics = scan_fn(state, stacked, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == K
