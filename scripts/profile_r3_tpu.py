"""Round-3 TPU measurement batch (ONE process — the axon session setup and
remote compiles dominate, so everything rides together):

  A. March-kernel block_rays sweep under mlp_dtype=bfloat16 — bf16 halves
     the in-kernel weight working set, so blocks that failed Mosaic compile
     at f32 (shadow 32/64, importance 128) get retried (VERDICT r2 item 3).
  B. Full train step at batch 512 with the winning march configs.
  C. Occupancy curve: train step at 512/1024/2048/4096 rays, fused on AND
     off — persists the batch sweep PROFILE.md's "occupancy, not kernel
     quality" conclusion rests on (VERDICT r2 item 2).

Prints one tagged line per measurement; transcribe into PROFILE.md.
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


def phase_a():
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

    results = {}
    for dtype in ("float32", "bfloat16"):
        for br in (32, 64, 128):
            tag = f"importance dtype={dtype} block_rays={br}"
            try:
                f = functools.partial(
                    fused_importance_z, params, cfg, o, d, z0,
                    block_rays=br, mlp_dtype=dtype,
                )
                t = timed(f) * 1e3
                results[("imp", dtype, br)] = t
                print(f"[A] {tag:46s} {t:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[A] {tag:46s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
        for br in (16, 32, 64):
            tag = f"shadow     dtype={dtype} block_rays={br}"
            try:
                g = functools.partial(
                    fused_shadow_tau, params, cfg, o, d, z0, sdist,
                    jnp.asarray(64.0), jnp.asarray(1.0),
                    block_rays=br, mlp_dtype=dtype,
                )
                t = timed(g) * 1e3
                results[("sha", dtype, br)] = t
                print(f"[A] {tag:46s} {t:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[A] {tag:46s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
    return results


def phase_b(results):
    from bench import _measure

    base = _measure("auto", 512, 16)
    print(f"[B] step 512 defaults                     {base:10.0f} rays/s", flush=True)

    # Winning configs from phase A (if any bf16 block beat the defaults).
    best_imp = min(
        ((t, dt, br) for (k, dt, br), t in results.items() if k == "imp"),
        default=None,
    )
    best_sha = min(
        ((t, dt, br) for (k, dt, br), t in results.items() if k == "sha"),
        default=None,
    )
    if best_imp and best_sha:
        _, idt, ibr = best_imp
        _, sdt, sbr = best_sha
        if (idt, ibr) != ("float32", 32) or (sdt, sbr) != ("float32", 16):
            dt = "bfloat16" if "bfloat16" in (idt, sdt) else "float32"
            r = _measure(
                "auto", 512, 16,
                renderer_overrides=dict(
                    march_dtype=dt, importance_block_rays=ibr, shadow_block_rays=sbr
                ),
            )
            print(
                f"[B] step 512 march dtype={dt} imp_br={ibr} sha_br={sbr}"
                f"  {r:10.0f} rays/s",
                flush=True,
            )


def phase_c():
    from bench import FLAGSHIP_FLOPS_PER_RAY, TPU_V5E_BF16_PEAK_TFLOPS, _measure

    for fused in ("auto", "off"):
        for batch in (512, 1024, 2048, 4096):
            r = _measure(fused, batch, 16)
            mfu = r * FLAGSHIP_FLOPS_PER_RAY / 1e12 / TPU_V5E_BF16_PEAK_TFLOPS
            print(
                f"[C] fused={fused:4s} batch={batch:5d}  {r:10.0f} rays/s"
                f"  MFU {mfu*100:5.1f}%",
                flush=True,
            )


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    res = phase_a()
    phase_b(res)
    phase_c()
    print("DONE", flush=True)
