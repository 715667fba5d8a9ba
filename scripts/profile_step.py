"""Component-level timing of the training step on the live backend.

Times (a) the full train step, (b) the two fused Pallas marches alone (f32
and bf16 weight dtypes), (c) the step with hints disabled, to locate where
the 20 ms goes.  Timing discipline per CLAUDE.md: everything jitted, >=4
warmup calls, scalar readback to force completion.
"""
from __future__ import annotations

import dataclasses
import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20, warmup=4, **kw):
    for _ in range(warmup):
        r = fn(*args, **kw)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x).reshape(-1)[0]), r
        )
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), r)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step
    from nrhints_tpu.render.renderer import render_rays
    from nrhints_tpu.camera.rays import generate_rays
    from nrhints_tpu.kernels.march import fused_importance_z, fused_shadow_tau

    batch = 512
    cfg, camera, params, buffers, pixels = _flagship_setup(batch=batch)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    key = jax.random.PRNGKey(0)

    results = {}

    # --- full step
    step_fn = make_train_step(cfg, camera, buffers, optimizer, donate=False)
    dt = timed(lambda: step_fn(state, pixels, key)[1]["loss"])
    results["full_step"] = dt

    # --- step without hints
    rcfg = dataclasses.replace(
        cfg.model.renderer, shadow_hint=False, specular_hint=False
    )
    cfg_nh = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, renderer=rcfg))
    from nrhints_tpu.render.renderer import init_model_params

    params_nh = init_model_params(jax.random.PRNGKey(1), cfg_nh.model)
    params_nh = {"renderer": params_nh, "raygen": params["raygen"]}
    opt_nh = make_optimizer(cfg_nh)
    state_nh = init_train_state(params_nh, opt_nh)
    step_nh = make_train_step(cfg_nh, camera, buffers, opt_nh, donate=False)
    results["step_no_hints"] = timed(lambda: step_nh(state_nh, pixels, key)[1]["loss"])

    # --- step without importance fusion either (pure XLA)
    rcfg_x = dataclasses.replace(cfg.model.renderer, fused_kernels="off")
    cfg_x = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, renderer=rcfg_x))
    step_x = make_train_step(cfg_x, camera, buffers, optimizer, donate=False)
    results["full_step_xla_only"] = timed(lambda: step_x(state, pixels, key)[1]["loss"])

    # --- isolated kernels
    sdf_params = params["renderer"]["sdf"]
    scfg = cfg.model.sdf_network
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    sdist = jnp.full((batch, 1), 2.0 / 64)

    for dt_name in ("float32", "bfloat16"):
        f = functools.partial(fused_importance_z, mlp_dtype=dt_name)
        results[f"importance_kernel_{dt_name}"] = timed(
            lambda: f(sdf_params, scfg, o, d, z0)
        )
        g = functools.partial(fused_shadow_tau, mlp_dtype=dt_name)
        results[f"shadow_kernel_{dt_name}"] = timed(
            lambda: g(
                sdf_params, scfg, o, d, z0, sdist,
                jnp.asarray(64.0), jnp.asarray(1.0),
            )
        )

    for k, v in results.items():
        print(f"{k:32s} {v * 1e3:8.2f} ms")
    print(f"{'rays/s full step':32s} {batch / results['full_step']:10.0f}")


if __name__ == "__main__":
    main()
