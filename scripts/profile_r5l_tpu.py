"""Round-5 phase L: where does the EVAL (inference) path's time go?

Motivation: BENCH extras measure the whole-image eval path at ~42k rays/s
(chunk 512 inside one lax.map dispatch) = ~12.2 ms per 512-ray chunk —
about the cost of a FULL train step (fwd+bwd+Adam, 12.35 ms), while the
phase-J component budget prices the forward work at ~7 ms (marches 4.06 +
core fwd 2.22 + reflectance/composite).  Either the eval forward really
costs ~12 ms (then: which component?), or the render_image harness loses
~5 ms somewhere (transfer, lax.map scheduling, chunk shape).

L1: scan-8-amortized forward_pipeline at batch 512 — eval mode vs train
    mode, then hint toggles to decompose.
L2: Evaluator.render_image at 65,536 rays — device-only (jit output
    readback) vs the full render_image call (host device_get of all maps)
    to split device time from tunnel transfer.

Usage: python scripts/profile_r5l_tpu.py L1 L2
"""
from __future__ import annotations

import dataclasses
import sys
import time

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
from scripts._profile_util import compare, report, time_ms

enable_compilation_cache()

K = 8


def _scanned_forward(cfg, camera, params, buffers, pixels, *, is_training,
                     key=None):
    """K forward_pipeline calls inside one jit; a tiny params perturbation
    threads the carry through every iteration so XLA cannot CSE them."""

    @jax.jit
    def g(p):
        def body(carry, i):
            c, pp = carry
            # data dependence: nudge every float param leaf by the carry
            pr = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 1e-30
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                pp,
            )
            out = step_mod.forward_pipeline(
                pr, buffers, cfg, camera, pixels,
                jax.random.fold_in(key, i) if key is not None else None,
                is_training=is_training, geometry_warmup=False,
                cos_anneal_ratio=1.0, mesh=None,
            )
            return (jnp.sum(out.rgb) * 1e-20 + c, pp), None

        (c, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), p), jnp.arange(K)
        )
        return c

    return lambda: g(params)


def phase_l1():
    print(f"=== Phase L1: scan-{K} forward_pipeline, batch 512 ===", flush=True)
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=512)
    key = jax.random.PRNGKey(7)

    def with_renderer(**kw):
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                renderer=dataclasses.replace(cfg.model.renderer, **kw),
            ),
        )

    variants = {
        "eval fwd (shipped)": (cfg, False, None),
        "train fwd (shipped)": (cfg, True, key),
        "eval fwd, shadow_hint off": (with_renderer(shadow_hint=False), False, None),
        "eval fwd, specular_hint off": (with_renderer(specular_hint=False), False, None),
        "eval fwd, both hints off": (
            with_renderer(shadow_hint=False, specular_hint=False), False, None),
    }
    res = {}
    for label, (c, tr, k) in variants.items():
        try:
            fn = _scanned_forward(c, camera, params, buffers, pixels,
                                  is_training=tr, key=k)
            best, reps = time_ms(fn, iters=10)
            res[label] = best / K
            report(label, best / K, [r / K for r in reps])
        except Exception as e:
            print(f"  {label:<44s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    compare(res)


def phase_l2():
    print("=== Phase L2: render_image 65,536 rays — device vs transfer ===",
          flush=True)
    n = 65536
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=n)
    side = int(n ** 0.5)
    pixels = jax.tree_util.tree_map(
        lambda a: a.reshape((side, side) + a.shape[1:]), pixels)
    ev = eval_mod.Evaluator(cfg, camera, buffers, mesh=None)

    # Full user-visible call (device + device_get of every output map).
    for _ in range(2):
        ev.render_image(params, pixels)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        ev.render_image(params, pixels)
    full_s = (time.perf_counter() - t0) / iters
    print(f"  render_image full          {full_s * 1e3:9.1f} ms  "
          f"{n / full_s:10.1f} rays/s", flush=True)

    # Device-only: same jitted impl, one scalar readback.
    prepped = ev._prepare_params(params)
    flat = pixels.flatten() if hasattr(pixels, "flatten") else pixels
    batched, _ = ev._chunk_and_shard(flat, n)

    def dev_only():
        return ev._render_image_jit(prepped, batched)["rgb"]

    best, reps = time_ms(dev_only, iters=4, warmup=2)
    print(f"  render_image device-only   {best:9.1f} ms  "
          f"{n / best * 1e3:10.1f} rays/s  (repeats "
          f"{'/'.join(f'{r:.1f}' for r in reps)})", flush=True)
    print(f"  implied transfer+host      {full_s * 1e3 - best:9.1f} ms", flush=True)


def phase_l3():
    print("=== Phase L3: pipelined multi-view rendering (4 x 65,536 rays) ===",
          flush=True)
    n = 65536
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=n)
    side = int(n ** 0.5)
    pixels = jax.tree_util.tree_map(
        lambda a: a.reshape((side, side) + a.shape[1:]), pixels)
    ev = eval_mod.Evaluator(cfg, camera, buffers, mesh=None)
    views = 4
    for _ in range(2):
        ev.render_image(params, pixels)

    # Serial (render_image per view: finalize blocks before next dispatch).
    t0 = time.perf_counter()
    for _ in range(views):
        ev.render_image(params, pixels)
    serial_s = time.perf_counter() - t0
    print(f"  serial   {serial_s / views * 1e3:9.1f} ms/view  "
          f"{n * views / serial_s:10.1f} rays/s", flush=True)

    # Pipelined: dispatch view k+1 before finalizing view k.
    t0 = time.perf_counter()
    pending = ev.render_image_async(params, pixels)
    for i in range(views):
        nxt = ev.render_image_async(params, pixels) if i + 1 < views else None
        pending()
        pending = nxt
    pipe_s = time.perf_counter() - t0
    print(f"  pipelined{pipe_s / views * 1e3:9.1f} ms/view  "
          f"{n * views / pipe_s:10.1f} rays/s", flush=True)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["L1", "L2", "L3"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"L1": phase_l1, "L2": phase_l2, "L3": phase_l3}[p.upper()]()
    print("done", flush=True)
