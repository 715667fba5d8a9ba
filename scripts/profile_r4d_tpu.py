"""Round-4 session D: stash_all (4L backward) vs stash (5L) on the chip."""
from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from nrhints_tpu.kernels.core_mlp import fused_sdf_value_feat_grad


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 512 * 128
    scfg = SDFNetConfig()
    sdf_params = sdf_init(jax.random.PRNGKey(1), scfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)) * 0.3

    def loss(p, backward):
        s, ft, g = fused_sdf_value_feat_grad(p, scfg, x, backward=backward)
        return jnp.sum(s) + jnp.sum(ft * 1e-3) + jnp.sum(
            (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
        )

    for backward in ("stash", "stash_all"):
        try:
            t = timed(
                jax.jit(
                    lambda bk=backward: jax.grad(lambda p: loss(p, bk))(sdf_params)[
                        "lin0"
                    ]["g"]
                )
            )
            print(f"sdf fwd+bwd backward={backward:10s} {t:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"sdf fwd+bwd backward={backward:10s} FAILED: {str(e)[:120]}", flush=True)

    from bench import _measure

    for backward in ("stash", "stash_all"):
        try:
            t0 = time.time()
            rays = _measure("auto", 512, 16, renderer_overrides=dict(core_backward=backward))
            print(
                f"step core={backward:10s} {rays:10.0f} rays/s ({512/rays*1e3:.2f} ms)"
                f" [{time.time()-t0:.0f}s]", flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"step core={backward:10s} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
