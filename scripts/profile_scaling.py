"""Batch-size scaling of the train step + XLA cost analysis.

Separates fixed dispatch overhead from per-ray cost, and prints the
compiler's flops/bytes estimates for the flagship step.
"""
from __future__ import annotations

import pathlib
import sys
import time

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        float(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(r)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    for batch in (512, 1024, 2048):
        cfg, camera, params, buffers, pixels = _flagship_setup(batch=batch)
        opt = make_optimizer(cfg)
        st = init_train_state(params, opt)
        step = make_train_step(cfg, camera, buffers, opt, donate=False)
        key = jax.random.PRNGKey(0)
        dtms = timed(lambda: step(st, pixels, key)[1]["loss"]) * 1e3
        print(f"batch {batch:5d}  {dtms:8.2f} ms  {batch / dtms * 1e3:10.0f} rays/s", flush=True)
        if batch == 512:
            lowered = step.lower(st, pixels, key)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            keys = ["flops", "bytes accessed", "bytes accessed0{}", "transcendentals",
                    "optimal_seconds"]
            for k in sorted(ca):
                if "bytes" in k or k in ("flops", "transcendentals", "optimal_seconds"):
                    print(f"    {k:28s} {ca[k]:.3e}", flush=True)


if __name__ == "__main__":
    main()
