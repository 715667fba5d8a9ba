"""Measure multi-step-per-dispatch: lax.scan over K train steps vs K
single-step dispatches.

The flagship step is ~17 ms on one v5e chip via the axon tunnel; if a
per-dispatch host/RPC overhead is a visible fraction of that, folding K
steps into one dispatch (scan over K pre-sampled batches) recovers it.
Timing discipline per CLAUDE.md: jit everything, >=4 warmups, scalar
readback to force completion.

Usage: python scripts/profile_scan_steps.py [K ...]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
        make_train_step_scan,
    )

    ks = [int(a) for a in sys.argv[1:]] or [4, 16]
    batch = 512
    cfg, camera, params, buffers, pixels = _flagship_setup(batch=batch)
    optimizer = make_optimizer(cfg)
    # The step fns donate state; rebuild from host copies for each variant.
    params_host = jax.device_get(params)

    def fresh_state():
        p = jax.tree_util.tree_map(jnp.asarray, params_host)
        return init_train_state(p, optimizer)

    step_fn = make_train_step(cfg, camera, buffers, optimizer, donate=True)
    key = jax.random.PRNGKey(0)

    # Baseline: K single-step dispatches, chained (the real loop's pattern).
    state = fresh_state()
    for i in range(4):
        state, metrics = step_fn(state, pixels, jax.random.fold_in(key, i))
        float(metrics["loss"])
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, pixels, jax.random.fold_in(key, 100 + i))
    float(metrics["loss"])
    per_step_single = (time.perf_counter() - t0) / iters
    print(f"single-step dispatch: {per_step_single*1e3:.2f} ms/step "
          f"({batch/per_step_single:,.0f} rays/s)")

    for K in ks:
        scan_fn = make_train_step_scan(
            cfg, camera, buffers, optimizer, n_steps=K, donate=True
        )
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), pixels
        )
        state = fresh_state()
        for i in range(4):
            state, metrics = scan_fn(state, stacked, jax.random.fold_in(key, i))
            float(metrics["loss"])
        outer = max(60 // K, 8)
        t0 = time.perf_counter()
        for i in range(outer):
            state, metrics = scan_fn(state, stacked, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])
        per_step = (time.perf_counter() - t0) / (outer * K)
        print(f"scan K={K:3d}:            {per_step*1e3:.2f} ms/step "
              f"({batch/per_step:,.0f} rays/s)  "
              f"[{(per_step_single/per_step-1)*100:+.1f}% vs single]")


if __name__ == "__main__":
    main()
