"""Per-round cost of the march refinement: time fused_importance_z at
rounds = 0..4 (z0 width 128-16r keeps the buffer geometry legal) and fit
T(r) = sweep(128-16r) + r * round_cost.

Locates how much of the ~2.35 ms importance kernel is the serial
refinement machinery vs the MLP sweeps — the step's biggest remaining
sink after the round-4 stash backward.
"""
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
from nrhints_tpu.kernels.march import fused_importance_z


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    scfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(1), scfg)
    rng = np.random.default_rng(0)
    B = 512
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)) * 0.1
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    results = {}
    for rounds in (0, 1, 2, 3, 4):
        n0 = 128 - 16 * rounds
        z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n0), (B, n0))
        try:
            t = timed(
                jax.jit(
                    lambda r=rounds, z=z0: fused_importance_z(
                        params, scfg, o, d, z, rounds=r, block_rays=32
                    )
                )
            )
            results[rounds] = t
            print(f"rounds={rounds} (initial sweep {n0} pts): {t:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"rounds={rounds}: FAILED {str(e)[:100]}", flush=True)

    if len(results) >= 3:
        # T(r) = a + b*(128-16r) + c*r  (a: fixed, b: per-sweep-point, c: per-round)
        rs = np.array(sorted(results))
        T = np.array([results[r] for r in rs])
        A = np.stack([np.ones_like(rs), 128.0 - 16.0 * rs, rs.astype(float)], axis=1)
        coef, *_ = np.linalg.lstsq(A, T, rcond=None)
        print(
            f"fit: fixed {coef[0]:.2f} ms + {coef[1]*1e3:.2f} us/sweep-pt-column"
            f" + {coef[2]:.2f} ms/refinement-round", flush=True,
        )


if __name__ == "__main__":
    main()
