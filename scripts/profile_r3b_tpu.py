"""Round-3 TPU measurement batch, part 2 (ONE process; do NOT edit repo
modules while this runs — live edits race lazy imports):

  D. Split shadow march sweep (final_block x refine_block) — phase A showed
     the monolith is VMEM-capped at block_rays=16 with bf16 weights NOT
     unlocking larger blocks (activations are the hog), so the split kernel
     is the remaining lever (VERDICT r2 item 3).
  B. Train-step variants at 512 rays: defaults, importance_block_rays=64
     (isolated kernel won 2.56 vs 2.63 ms), best split config, combined.
  C. Occupancy curve: step at 512/1024/2048/4096 rays, fused on (winning
     config) AND off (VERDICT r2 item 2).

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
    # (32,64)/(32,32)/(64,64) measured FAILED Mosaic compile 2026-08-20
    # (final-sweep dual-stream activations exceed VMEM at block 32) —
    # dropped from the sweep so reruns don't pay failing remote compiles.
    for fbr, rbr in ((16, 64), (16, 32)):
        tag = f"shadow-split final={fbr} refine={rbr}"
        try:
            f = functools.partial(
                fused_shadow_tau, params, cfg, o, d, z0, sdist,
                jnp.asarray(64.0), jnp.asarray(1.0),
                block_rays=fbr, split=True, refine_block_rays=rbr,
            )
            t = timed(f) * 1e3
            results[(fbr, rbr)] = t
            print(f"[D] {tag:42s} {t:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[D] {tag:42s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
    return results


def phase_b(split_results):
    # NOTE: importance_block_rays=64 compiles in ISOLATION but exceeds the
    # scoped-vmem stack limit by 780K inside the full train step (XLA
    # co-schedules the custom call with surrounding fusions) — measured
    # 2026-08-20, so it is not a step-level variant.
    from bench import _measure

    variants = {"defaults": {}}
    best = min(((t, k) for k, t in split_results.items()), default=None)
    if best is not None:
        _, (fbr, rbr) = best
        variants["split"] = dict(
            shadow_split=True, shadow_block_rays=fbr, shadow_refine_block_rays=rbr
        )

    step_results = {}
    for name, ov in variants.items():
        try:
            r = _measure("auto", 512, 16, renderer_overrides=ov)
        except Exception as e:  # noqa: BLE001
            print(f"[B] step 512 {name:14s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        step_results[name] = (r, ov)
        print(f"[B] step 512 {name:14s} {r:10.0f} rays/s", flush=True)
    return step_results


def phase_c(step_results):
    from bench import FLAGSHIP_FLOPS_PER_RAY, TPU_V5E_BF16_PEAK_TFLOPS, _measure

    best_name, (best_r, best_ov) = max(
        step_results.items(), key=lambda kv: kv[1][0]
    )
    print(f"[C] curve config = {best_name} {best_ov}", flush=True)
    for fused, ov in (("auto", best_ov), ("off", {})):
        for batch in (512, 1024, 2048, 4096):
            try:
                r = _measure(fused, batch, 16, renderer_overrides=ov)
            except Exception as e:  # noqa: BLE001
                print(f"[C] fused={fused:4s} batch={batch:5d}  FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            mfu = r * FLAGSHIP_FLOPS_PER_RAY / 1e12 / TPU_V5E_BF16_PEAK_TFLOPS
            print(
                f"[C] fused={fused:4s} batch={batch:5d}  {r:10.0f} rays/s"
                f"  MFU {mfu*100:5.1f}%",
                flush=True,
            )


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    res = phase_d()
    steps = phase_b(res)
    phase_c(steps)
    print("DONE", flush=True)
