"""Time the flagship train step with f32 vs bf16 field-MLP matmuls."""
from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, iters=30, warmup=4):
    for _ in range(warmup):
        float(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(r)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.render.renderer import init_model_params
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    batch = 512
    cfg, camera, params, buffers, pixels = _flagship_setup(batch=batch)

    def with_dtype(cfg, dt):
        m = cfg.model
        return dataclasses.replace(cfg, model=dataclasses.replace(
            m,
            sdf_network=dataclasses.replace(m.sdf_network, compute_dtype=dt),
            reflectance_network=dataclasses.replace(m.reflectance_network, compute_dtype=dt),
        ))

    for dt in ("float32", "bfloat16"):
        c = with_dtype(cfg, dt)
        p = init_model_params(jax.random.PRNGKey(1), c.model)
        p = {"renderer": p, "raygen": params["raygen"]}
        opt = make_optimizer(c)
        st = init_train_state(p, opt)
        step = make_train_step(c, camera, buffers, opt, donate=False)
        key = jax.random.PRNGKey(0)
        dtms = timed(lambda: step(st, pixels, key)[1]["loss"]) * 1e3
        print(f"{dt:10s} {dtms:8.2f} ms  {batch / dtms * 1e3:10.0f} rays/s")


if __name__ == "__main__":
    main()
