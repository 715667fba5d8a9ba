"""Split shadow-march measurement batch (run after profile_r3_tpu.py):

  D. fused_shadow_tau split=True at (final_block, refine_block, dtype)
     combos the monolith cannot compile (VERDICT r2 item 3: "split the
     shadow kernel into refinement + final-sweep kernels so each fits
     larger blocks").
  E. Full train step with the winning split config vs the monolith
     default.

One process, one axon session; transcribe into PROFILE.md.
"""
from __future__ import annotations

import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        r = fn()
        float(jnp.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def phase_d():
    from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
    from nrhints_tpu.kernels.march import fused_shadow_tau

    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    batch = 512
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    sdist = jnp.full((batch, 1), 2.0 / 64)

    results = {}
    for dtype in ("float32", "bfloat16"):
        for fbr, rbr in ((16, 32), (16, 64), (32, 32), (32, 64), (64, 64)):
            tag = f"shadow-split dtype={dtype} final={fbr} refine={rbr}"
            try:
                f = functools.partial(
                    fused_shadow_tau, params, cfg, o, d, z0, sdist,
                    jnp.asarray(64.0), jnp.asarray(1.0),
                    block_rays=fbr, split=True, refine_block_rays=rbr,
                    mlp_dtype=dtype,
                )
                t = timed(f) * 1e3
                results[(dtype, fbr, rbr)] = t
                print(f"[D] {tag:52s} {t:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[D] {tag:52s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
    return results


def phase_e(results):
    from bench import _measure

    base = _measure("auto", 512, 16)
    print(f"[E] step 512 monolith defaults              {base:10.0f} rays/s", flush=True)
    best = min(((t, k) for k, t in results.items()), default=None)
    if best is None:
        return
    t, (dt, fbr, rbr) = best
    r = _measure(
        "auto", 512, 16,
        renderer_overrides=dict(
            shadow_split=True, shadow_block_rays=fbr,
            shadow_refine_block_rays=rbr, march_dtype=dt,
        ),
    )
    print(
        f"[E] step 512 split dtype={dt} final={fbr} refine={rbr}"
        f"  {r:10.0f} rays/s",
        flush=True,
    )


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    res = phase_d()
    phase_e(res)
    print("DONE", flush=True)
