"""Round-5 phases M2/M3: locate the 4.3 ms grad->step gap; XLA reflectance.

Phase M measured (same session): full loss fwd+bwd 8.277 ms vs full train
step 12.554 — a 4.28 ms gap nominally holding only optimizer.update +
apply_updates (+ state threading), which cannot be ~1.5M-param Adam
arithmetic (~0.1 ms of HBM traffic).  M2 adds the optimizer to the
scanned loss-grad body piecewise to find where the time appears:
  (a) + optax update/apply, same batch every iteration
  (b) + distinct batches per iteration (scan over stacked pixels, the real
      step's input pattern)
M3 times the reflectance trunk as a full-batch XLA stream (the march-sweep
lesson): the Pallas reflectance kernel measured 2.111 ms fwd / 2.819
fwd+bwd = ~18 TF/s on a ~38 GFLOP chain.

Usage: python scripts/profile_r5n_tpu.py M2 M3
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401  (eager import: edit-safety)
import nrhints_tpu.train.step as step_mod
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp as core_mlp
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import nrhints_tpu.fields.reflectance as refl_mod
import __graft_entry__
from scripts._profile_util import report, time_ms

enable_compilation_cache()

K = 8
N = 65536


def phase_m2():
    import optax

    print("=== Phase M2: grad -> step gap (batch 512) ===", flush=True)
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=512)
    optimizer = step_mod.make_optimizer(cfg)
    state0 = step_mod.init_train_state(params, optimizer)
    key = jax.random.PRNGKey(3)

    def loss_fn(q, batch, i):
        out = step_mod.forward_pipeline(
            q, buffers, cfg, camera, batch, jax.random.fold_in(key, i),
            is_training=True, geometry_warmup=False,
            cos_anneal_ratio=1.0, mesh=None,
        )
        loss, _ = step_mod.compute_loss_dict(out, batch.rgb_gt, cfg.model.igr_weight)
        return loss

    # (a) grads + optimizer update, same batch each iteration.
    @jax.jit
    def step_scan_same_batch(st):
        def body(s, i):
            grads = jax.grad(loss_fn)(s.params, pixels, i)
            updates, opt2 = optimizer.update(grads, s.opt_state, s.params)
            p2 = optax.apply_updates(s.params, updates)
            return step_mod.TrainState(step=s.step + 1, params=p2, opt_state=opt2), None

        s, _ = jax.lax.scan(body, st, jnp.arange(K))
        return s.step, jax.tree_util.tree_leaves(s.params)[0]

    best, reps = time_ms(lambda: step_scan_same_batch(state0), iters=6)
    report("(a) grad+adam, same batch", best / K, [x / K for x in reps])

    # (b) grads + optimizer update, distinct batches (the real pattern).
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), pixels
    )

    @jax.jit
    def step_scan_batches(st):
        def body(carry, xs):
            s, i = carry
            batch = xs
            grads = jax.grad(loss_fn)(s.params, batch, i)
            updates, opt2 = optimizer.update(grads, s.opt_state, s.params)
            p2 = optax.apply_updates(s.params, updates)
            return (
                step_mod.TrainState(step=s.step + 1, params=p2, opt_state=opt2),
                i + 1,
            ), None

        (s, _), _ = jax.lax.scan(body, (st, jnp.int32(0)), stacked)
        return s.step, jax.tree_util.tree_leaves(s.params)[0]

    best, reps = time_ms(lambda: step_scan_batches(state0), iters=6)
    report("(b) grad+adam, stacked batches", best / K, [x / K for x in reps])

    # (c) the shipping make_train_step_scan WITHOUT donation.
    fn = step_mod.make_train_step_scan(
        cfg, camera, buffers, optimizer, n_steps=K, mesh=None, donate=False,
    )
    stacked16 = stacked
    kk = jax.random.PRNGKey(9)

    def run_c():
        s, m = fn(state0, stacked16, kk)
        return m["loss"]

    best, reps = time_ms(run_c, iters=6)
    report("(c) make_train_step_scan donate=off", best / K, [x / K for x in reps])


def phase_m3():
    print("=== Phase M3: reflectance trunk, pallas kernel vs XLA stream ===",
          flush=True)
    import dataclasses

    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=512)
    rcfg = cfg.model.reflectance_network
    cparams = params["renderer"]["color"]
    rng = np.random.default_rng(0)

    def r(*shape):
        return jnp.asarray(rng.normal(0, 0.5, shape).astype(np.float32))

    pts, nrm, vd, pls = r(N, 3), r(N, 3), r(N, 3), r(N, 3)
    feat, vis, spec = r(N, 256), r(N, 1), r(N, 4)

    def scanned(fn, x0):
        @jax.jit
        def g(x):
            def body(h, _):
                return fn(h), None

            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        return lambda: g(x0)

    variants = {
        "pallas fwd (M1 anchor)": ("pallas", None, False),
        "xla fwd f32": ("xla", "float32", False),
        "xla fwd bf16": ("xla", "bfloat16", False),
        "pallas fwd+bwd (M1 anchor)": ("pallas", None, True),
        "xla fwd+bwd f32": ("xla", "float32", True),
        "xla fwd+bwd bf16": ("xla", "bfloat16", True),
    }
    for label, (impl, cdt, with_bwd) in variants.items():
        if impl == "pallas":
            def apply(p, x):
                return core_mlp.fused_reflectance_forward(
                    p, rcfg, x, nrm, vd, feat, pls, vis, spec, backward="stash",
                )
        else:
            rc = dataclasses.replace(rcfg, compute_dtype=cdt)

            def apply(p, x, rc=rc):
                return refl_mod.reflectance_forward(
                    p, rc, x, nrm, vd, feat, pls, vis, spec,
                )

        if with_bwd:
            def one(x, apply=apply):
                def loss(p):
                    return jnp.sum(apply(p, x) ** 2)

                g = jax.grad(loss)(cparams)
                leaf = jax.tree_util.tree_leaves(g)[0]
                return x + jnp.sum(leaf) * 1e-20
        else:
            def one(x, apply=apply):
                return x + apply(cparams, x) * 1e-20

        try:
            best, reps = time_ms(scanned(one, pts), iters=6)
            report(label, best / K, [x / K for x in reps])
        except Exception as e:
            print(f"  {label:<44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["M2", "M3"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"M2": phase_m2, "M3": phase_m3}[p.upper()]()
    print("done", flush=True)
