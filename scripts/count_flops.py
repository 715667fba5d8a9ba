"""Count per-step FLOPs of the flagship training step from XLA's own cost
analysis (CPU lowering of the pure-jnp path, fused_kernels=off — Pallas
custom calls are invisible to cost_analysis, and the jnp path computes the
identical math).

The resulting constant is consumed by bench.py for achieved-TFLOP/s and MFU
reporting; rerun this after any change to the render math or the flagship
config and update FLAGSHIP_FLOPS_PER_STEP there.

    python scripts/count_flops.py [--batch 512]
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_setup
    from nrhints_tpu.render.renderer import RendererConfig
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    cfg, camera, params, buffers, pixels = _flagship_setup(batch=args.batch)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            renderer=dataclasses.replace(cfg.model.renderer, fused_kernels="off"),
        ),
    )
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, camera, buffers, optimizer, donate=False)

    lowered = jax.jit(lambda s, b, k: step_fn(s, b, k)).lower(
        state, pixels, jax.random.PRNGKey(0)
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    print(f"batch={args.batch}")
    print(f"flops_per_step={flops:.6e}")
    print(f"flops_per_ray={flops / args.batch:.6e}")
    for k in sorted(cost):
        if "bytes" in k or k in ("transcendentals",):
            print(f"{k}={float(cost[k]):.6e}")


if __name__ == "__main__":
    main()
