"""block_rays sweep for the fused march kernels on the live backend."""
from __future__ import annotations

import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        r = fn()
        float(jnp.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
    from nrhints_tpu.kernels.march import fused_importance_z, fused_shadow_tau

    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    batch = 512
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    sdist = jnp.full((batch, 1), 2.0 / 64)

    for br in (16, 32, 64, 128):
        try:
            f = functools.partial(fused_importance_z, params, cfg, o, d, z0, block_rays=br)
            t = timed(f)
            print(f"importance block_rays={br:4d}  {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"importance block_rays={br:4d}  FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
    for br in (16, 32, 64):
        try:
            g = functools.partial(
                fused_shadow_tau, params, cfg, o, d, z0, sdist,
                jnp.asarray(64.0), jnp.asarray(1.0), block_rays=br,
            )
            t = timed(g)
            print(f"shadow     block_rays={br:4d}  {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"shadow     block_rays={br:4d}  FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
