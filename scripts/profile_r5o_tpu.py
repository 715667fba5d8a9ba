"""Round-5 phase O: reflectance_impl="xla" decision session + the M2 DCE
control.

O1: in-step A/B (pallas vs xla trunk), 2 repeats each, one session.
O2: eval-path device-only render rate for both trunks (the eval chunk has
    no backward, so the 0.4 ms isolated fwd gap should show ~directly).
O3: the honest no-Adam fwd+bwd — phase M's 8.277 ms "full loss fwd+bwd"
    read ONE grad leaf, so XLA DCE'd the other weight-cotangent chains;
    this sums EVERY leaf.  Expect ~12.6 ms (closing the fake 4.3 ms
    "optimizer gap" of phase M2).

Usage: python scripts/profile_r5o_tpu.py O1 O2 O3
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401  (eager import: edit-safety)
import nrhints_tpu.train.step as step_mod
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator as eval_mod
import __graft_entry__
import bench
from scripts._profile_util import compare, report, time_ms

enable_compilation_cache()

K = 8


def phase_o1():
    print("=== Phase O1: in-step reflectance_impl A/B (batch 512, spd 16) ===",
          flush=True)
    results = {}
    for label, impl in (("pallas trunk", "pallas"), ("xla trunk", "xla")):
        times = []
        for _ in range(2):
            rays = bench._measure(
                "auto", 512, 16, renderer_overrides={"reflectance_impl": impl}
            )
            times.append(512.0 / rays * 1e3)
        best = min(times)
        results[label] = best
        print(f"  {label:<16s} {512.0 / best * 1e3:10.1f} rays/s  {best:7.3f} ms"
              f"  (repeats {'/'.join(f'{t:.3f}' for t in times)})", flush=True)
    compare(results)


def phase_o2():
    print("=== Phase O2: eval device-only render, both trunks ===", flush=True)
    n = 65536
    results = {}
    for label, impl in (("pallas trunk", "pallas"), ("xla trunk", "xla")):
        cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=n)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                renderer=dataclasses.replace(
                    cfg.model.renderer, reflectance_impl=impl
                ),
            ),
        )
        side = int(n ** 0.5)
        pixels = jax.tree_util.tree_map(
            lambda a: a.reshape((side, side) + a.shape[1:]), pixels)
        ev = eval_mod.Evaluator(cfg, camera, buffers, mesh=None)
        batched, _ = ev._chunk_and_shard(pixels.flatten(), n)

        def dev_only(ev=ev, batched=batched, params=params):
            return ev._render_image_jit(params, batched)["rgb"]

        best, reps = time_ms(dev_only, iters=4, warmup=2)
        results[label] = best
        print(f"  {label:<16s} {best:9.1f} ms  {n / best * 1e3:10.1f} rays/s "
              f"(repeats {'/'.join(f'{r:.1f}' for r in reps)})", flush=True)
    compare(results)


def phase_o3():
    print("=== Phase O3: honest no-Adam fwd+bwd (ALL grad leaves) ===", flush=True)
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=512)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def loss_grad_scan(p):
        def body(carry, i):
            c, pp = carry
            pr = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 1e-30
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                pp,
            )

            def loss_fn(q):
                out = step_mod.forward_pipeline(
                    q, buffers, cfg, camera, pixels, jax.random.fold_in(key, i),
                    is_training=True, geometry_warmup=False,
                    cos_anneal_ratio=1.0, mesh=None,
                )
                loss, _ = step_mod.compute_loss_dict(
                    out, pixels.rgb_gt, cfg.model.igr_weight
                )
                return loss

            g = jax.grad(loss_fn)(pr)
            tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)
                      if jnp.issubdtype(l.dtype, jnp.floating))
            return (c + tot * 1e-20, pp), None

        (c, _), _ = jax.lax.scan(body, (jnp.asarray(0.0, jnp.float32), p),
                                 jnp.arange(K))
        return c

    best, reps = time_ms(lambda: loss_grad_scan(params), iters=6)
    report("full loss fwd+bwd, all leaves", best / K, [x / K for x in reps])


if __name__ == "__main__":
    phases = sys.argv[1:] or ["O1", "O2", "O3"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"O1": phase_o1, "O2": phase_o2, "O3": phase_o3}[p.upper()]()
    print("done", flush=True)
