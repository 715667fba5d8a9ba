"""Round-5 phase M: the residual train-step budget.

Phase J priced marches (4.06 ms) + core fwd+bwd (5.71) of the 12.35 ms
step; the ~2.6 ms residual (reflectance fwd+bwd, composite/sampling
machinery, Adam) was never decomposed.  M1 times the reflectance trunk
and the full loss fwd+bwd vs the full step (same session), all
scan-amortized so the ~0.6 ms fixed dispatch cost divides out.

Usage: python scripts/profile_r5m_tpu.py
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
import __graft_entry__
from scripts._profile_util import report, time_ms

enable_compilation_cache()

K = 8
N = 65536  # 512 rays x 128 samples


def _scanned(fn, x0):
    @jax.jit
    def g(x):
        def body(h, _):
            return fn(h), None

        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    return lambda: g(x0)


def main():
    print(f"=== Phase M: residual budget, batch 512 / {N} pts ===", flush=True)
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=512)
    rcfg = cfg.model.reflectance_network
    cparams = params["renderer"]["color"]
    rng = np.random.default_rng(0)

    def r(*shape):
        return jnp.asarray(rng.normal(0, 0.5, shape).astype(np.float32))

    pts, nrm, vd, pls = r(N, 3), r(N, 3), r(N, 3), r(N, 3)
    feat, vis, spec = r(N, 256), r(N, 1), r(N, 4)

    def refl_fwd(x):
        out = core_mlp.fused_reflectance_forward(
            cparams, rcfg, x, nrm, vd, feat, pls, vis, spec, backward="stash",
        )
        return x + out * 1e-20

    best, reps = time_ms(_scanned(refl_fwd, pts), iters=6)
    report("reflectance fwd (stash cfg)", best / K, [x / K for x in reps])

    def refl_fwdbwd(x):
        def loss(p):
            out = core_mlp.fused_reflectance_forward(
                p, rcfg, x, nrm, vd, feat, pls, vis, spec, backward="stash",
            )
            return jnp.sum(out * out)

        g = jax.grad(loss)(cparams)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return x + jnp.sum(leaf) * 1e-20

    best, reps = time_ms(_scanned(refl_fwdbwd, pts), iters=6)
    report("reflectance fwd+bwd (stash)", best / K, [x / K for x in reps])

    # Full loss fwd+bwd (no optimizer update), scanned with a params
    # perturbation threading the carry.
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
            leaf = jax.tree_util.tree_leaves(g["renderer"])[0]
            return (c + jnp.sum(leaf) * 1e-20, pp), None

        (c, _), _ = jax.lax.scan(body, (jnp.asarray(0.0, jnp.float32), p),
                                 jnp.arange(K))
        return c

    best, reps = time_ms(lambda: loss_grad_scan(params), iters=6)
    report("full loss fwd+bwd (no Adam)", best / K, [x / K for x in reps])

    # Full step incl. Adam, the bench methodology (scan-16 train step).
    import bench

    times = []
    for _ in range(2):
        rays = bench._measure("auto", 512, 16)
        times.append(512.0 / rays * 1e3)
    print(f"  full train step (bench anchor)              "
          f"{min(times):8.3f} ms  (repeats {'/'.join(f'{t:.3f}' for t in times)})",
          flush=True)


if __name__ == "__main__":
    main()
    print("done", flush=True)
