"""Benchmark: training-step throughput (rays/s/chip, forward+backward+Adam)
on the flagship NRHints config — the north-star metric from BASELINE.json.

Runs on whatever accelerator the default backend exposes (the real TPU chip
under the driver).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline normalizes against an estimated PyTorch-reference-on-A100
throughput of 10,000 rays/s/chip.  The reference repo publishes no numbers
(BASELINE.md); 10k rays/s is our documented estimate for the reference's
training step (512 rays x ~128 samples, double-backward SDF normals, and a
shadow march that roughly doubles SDF evals — NeuS-class systems land in
the low tens of thousands of rays/s on A100).  The north-star target is
vs_baseline >= 3.0.
"""
from __future__ import annotations

import json
import time

A100_REFERENCE_RAYS_PER_SEC = 10_000.0


def main() -> None:
    import jax

    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # cache hits skip the ~10-min remote compile

    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.parallel import mesh as mesh_lib
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    import jax.numpy as jnp

    from nrhints_tpu.train.step import make_train_step_scan

    batch = 512
    # K train steps per dispatch — the trainer's steps_per_dispatch mode
    # (bit-identical updates; tests/test_train.py::test_train_step_scan_*).
    # Measured on v5e: +2% over single-step dispatch (dispatch overhead is
    # mostly hidden by async dispatch; the step is device-bound).
    steps_per_dispatch = 16
    cfg, camera, params, buffers, pixels = _flagship_setup(batch=batch)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        state = mesh_lib.replicate(mesh, state)
        buffers = mesh_lib.replicate(mesh, buffers)

    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (steps_per_dispatch,) + x.shape), pixels
    )
    if mesh is not None:
        stacked = mesh_lib.shard_batch(mesh, jax.device_get(stacked), batch_axis=1)

    step_fn = make_train_step_scan(
        cfg, camera, buffers, optimizer, n_steps=steps_per_dispatch
    )
    key = jax.random.PRNGKey(0)

    # Warmup: the first few calls trigger distinct compiles (fresh vs
    # donated-buffer layouts); force a scalar readback on each so compile
    # time can't leak into the timed region.
    for i in range(4):
        state, metrics = step_fn(state, stacked, jax.random.fold_in(key, i))
        float(metrics["loss"])

    # Timed steady state: a state-threaded chain with one final readback
    # (the real training loop's access pattern — metrics are only pulled at
    # the logging interval).
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, stacked, jax.random.fold_in(key, 100 + i))
    float(metrics["loss"])  # forces the whole chain to completion
    dt = (time.perf_counter() - t0) / (iters * steps_per_dispatch)

    rays_per_sec = batch / dt
    rays_per_sec_per_chip = rays_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": "train_step_rays_per_sec_per_chip",
                "value": round(rays_per_sec_per_chip, 1),
                "unit": "rays/s/chip (fwd+bwd+adam, full NRHints config)",
                "vs_baseline": round(
                    rays_per_sec_per_chip / A100_REFERENCE_RAYS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
