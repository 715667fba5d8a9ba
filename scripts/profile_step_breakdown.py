"""Train-step time breakdown by component ablation on the real chip.

Times the full flagship step against variants with one component removed
(shadow hint, specular hint, fused kernels, eikonal backward) — the
differences locate where the 15.8 ms goes, guiding MFU work
(BASELINE.md: 24.3% MFU at batch 512).

    python scripts/profile_step_breakdown.py
"""
from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed_step(cfg, camera, buffers, pixels, params, iters=24, warmup=4):
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    opt = make_optimizer(cfg)
    state = init_train_state(jax.device_get(params), opt)
    step = make_train_step(cfg, camera, buffers, opt)
    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        state, m = step(state, pixels, jax.random.fold_in(key, i))
        float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, pixels, jax.random.fold_in(key, 100 + i))
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def forward_only_ms(cfg, camera, buffers, pixels, params, iters=24, warmup=4):
    from nrhints_tpu.train.step import forward_pipeline

    @jax.jit
    def fwd(p, b, k):
        out = forward_pipeline(
            p, buffers, cfg, camera, b, k,
            is_training=True, geometry_warmup=False, cos_anneal_ratio=jnp.asarray(1.0),
        )
        return jnp.sum(out.rgb)

    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        float(fwd(params, pixels, jax.random.fold_in(key, i)))
    t0 = time.perf_counter()
    for i in range(iters):
        r = fwd(params, pixels, jax.random.fold_in(key, 100 + i))
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.render.renderer import init_model_params

    batch = 512
    cfg0, camera, params, buffers, pixels = _flagship_setup(batch=batch)

    def variant(**renderer_overrides):
        m = cfg0.model
        return dataclasses.replace(
            cfg0,
            model=dataclasses.replace(
                m, renderer=dataclasses.replace(m.renderer, **renderer_overrides)
            ),
        )

    rows = [
        ("full step (fused)", cfg0),
        ("no shadow hint", variant(shadow_hint=False)),
        ("no specular hint", variant(specular_hint=False)),
        ("no hints at all", variant(shadow_hint=False, specular_hint=False)),
    ]
    base = None
    for label, cfg in rows:
        p = params
        if cfg is not cfg0:
            p = {
                "renderer": init_model_params(jax.random.PRNGKey(0), cfg.model),
                "raygen": params["raygen"],
            }
        ms = timed_step(cfg, camera, buffers, pixels, p)
        if base is None:
            base = ms
        print(f"{label:28s} {ms:7.2f} ms/step  (delta {base - ms:+6.2f})", flush=True)

    fms = forward_only_ms(cfg0, camera, buffers, pixels, params)
    print(f"{'forward only (fused)':28s} {fms:7.2f} ms      (backward+adam = {base - fms:.2f})", flush=True)


if __name__ == "__main__":
    main()
