"""Round-5 phases G/H: the rounds_impl="xla" march restructure + the
last-round-sweep skip, isolated and in-step.

Context (PROFILE.md round-5): the per-round 16-column MLP sweeps run at
~30 TF/s inside the fori_loop kernels vs ~55 as full-batch XLA streams,
and the LAST round's sweep was computed but never read (skipped now on
every path — bit-identical z).  rounds_impl="xla" leaves only the
merge/inverse-CDF machinery in (unrolled, per-round) Pallas kernels.

Usage: python scripts/profile_r5g_tpu.py G H
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401  (eager: edit-safety)
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march as march
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import __graft_entry__  # noqa: F401
import bench
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from scripts._profile_util import compare, report, time_ms

enable_compilation_cache()


def _march_inputs(batch=512):
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = rng.normal(size=(batch, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    sdist = jnp.full((batch, 1), 2.0 / 64)
    return cfg, params, o, d, z0, sdist


def phase_g():
    print("=== Phase G: rounds_impl='xla' isolated (batch 512) ===", flush=True)
    cfg, params, o, d, z0, sdist = _march_inputs()

    imp_cfgs = {
        "imp sweep=xla (r5 ship, lastskip)": dict(
            block_rays=32, split=True, sweep_impl="xla"
        ),
    }
    for br in (64, 128, 256, 512):
        imp_cfgs[f"imp sweep+rounds=xla mach_br={br}"] = dict(
            block_rays=br, split=True, sweep_impl="xla", rounds_impl="xla"
        )
    res = {}
    for label, kw in imp_cfgs.items():
        fn = functools.partial(march.fused_importance_z, params, cfg, o, d, z0, **kw)
        try:
            best, reps = time_ms(fn, iters=20)
            report(label, best, reps)
            res[label] = best
        except Exception as e:
            print(f"  {label:<52s} FAILED: {str(e)[:200]}", flush=True)
    compare(res)

    sh_cfgs = {
        "shadow sweep=xla (r5 ship)": dict(
            block_rays=16, split=True, refine_block_rays=32, sweep_impl="xla"
        ),
        "shadow sweep+rounds=xla br=128": dict(
            block_rays=16, split=True, refine_block_rays=128,
            sweep_impl="xla", rounds_impl="xla",
        ),
        "shadow all-xla bf16 br=128": dict(
            block_rays=16, split=True, refine_block_rays=128,
            sweep_impl="xla", rounds_impl="xla", final_impl="xla",
            mlp_dtype="bfloat16",
        ),
    }
    res = {}
    invs = jnp.asarray(64.0)
    anneal = jnp.asarray(0.7)
    for label, kw in sh_cfgs.items():
        fn = functools.partial(
            march.fused_shadow_tau, params, cfg, o, d, z0, sdist, invs, anneal, **kw
        )
        try:
            best, reps = time_ms(fn, iters=20)
            report(label, best, reps)
            res[label] = best
        except Exception as e:
            print(f"  {label:<52s} FAILED: {str(e)[:200]}", flush=True)
    compare(res)


def phase_h():
    print("=== Phase H: in-step (batch 512, spd 16) ===", flush=True)
    configs = {
        "sweep=xla (r5 ship + lastskip)": {"march_sweep_impl": "xla"},
        "sweep+rounds=xla br128": {
            "march_sweep_impl": "xla",
            "march_rounds_impl": "xla",
            "importance_block_rays": 128,
            "shadow_refine_block_rays": 128,
        },
    }
    results = {}
    for label, overrides in configs.items():
        try:
            times = []
            for _ in range(2):
                rays = bench._measure("auto", 512, 16, renderer_overrides=overrides)
                times.append(512.0 / rays * 1e3)
            best = min(times)
            results[label] = best
            print(
                f"  {label:<32s} {512.0 / best * 1e3:10.1f} rays/s  {best:7.3f} ms/step"
                f"  (repeats {'/'.join(f'{t:.3f}' for t in times)})",
                flush=True,
            )
        except Exception as e:
            print(f"  {label:<32s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    if results:
        compare(results)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["G", "H"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"G": phase_g, "H": phase_h}[p.upper()]()
    print("done", flush=True)
