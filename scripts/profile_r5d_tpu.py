"""Round-5 phase D/E: in-step A/B of the XLA march sweeps (+ scoped-vmem
unlocks if phase A opened them), and the N-width roofline probe.

Phase D — full train step (batch 512, steps_per_dispatch 16) over the
configs phase B/C motivated: march_sweep_impl="xla" moves the split
marches' initial sweeps to full-batch XLA matmuls (isolated: importance
2.60 -> 2.16 ms, shadow 4.37 -> 4.17), shadow_final_impl="xla" + bf16
moves the final dual sweep too (shadow 3.98 ms).

Phase E — the roofline control: an 8-layer chain with 512-wide layers vs
the 256-wide chain.  If 512-wide runs ~2x the TF/s, the ~60 TF/s measured
ceiling is a property of the 256-wide LAYER SHAPE (which parity pins),
grounding the "this structure's floor" claim.

Usage: python scripts/profile_r5d_tpu.py D E  (or a subset)
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401  (eager: edit-safety)
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import __graft_entry__  # noqa: F401
import bench
from scripts._profile_util import compare, report, time_ms

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

enable_compilation_cache()

VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": 65536}


def phase_d():
    print("=== Phase D: in-step XLA march sweeps (batch 512, spd 16) ===", flush=True)
    configs = {
        "defaults (r4 ship)": (None, None),
        "sweep=xla": ({"march_sweep_impl": "xla"}, None),
        "sweep+final=xla": (
            {"march_sweep_impl": "xla", "shadow_final_impl": "xla"}, None
        ),
        "sweep+final=xla bf16": (
            {
                "march_sweep_impl": "xla",
                "shadow_final_impl": "xla",
                "march_dtype": "bfloat16",
            },
            None,
        ),
    }
    # Appended by hand after phase A's readout (see profile_r5_tpu.py): any
    # unlocked blocked-optimum rides the best xla-sweep config.
    import os

    if os.environ.get("NRHINTS_R5_VMEM_UNLOCKED") == "1":
        configs["xla+bf16+blocks64/64+vmem"] = (
            {
                "march_sweep_impl": "xla",
                "shadow_final_impl": "xla",
                "march_dtype": "bfloat16",
                "importance_block_rays": 64,
                "shadow_refine_block_rays": 64,
            },
            VMEM_OPTS,
        )
        configs["xla+bf16+sdfbwd256+vmem"] = (
            {
                "march_sweep_impl": "xla",
                "shadow_final_impl": "xla",
                "march_dtype": "bfloat16",
                "core_block_pts_bwd": 256,
            },
            VMEM_OPTS,
        )
    results = {}
    for label, (overrides, opts) in configs.items():
        try:
            times = []
            for _ in range(2):  # N>=2 same-session repeats (VERDICT r4 #7)
                rays = bench._measure(
                    "auto", 512, 16,
                    renderer_overrides=overrides,
                    compiler_options=opts,
                )
                times.append(512.0 / rays * 1e3)
            best = min(times)
            results[label] = best
            print(
                f"  {label:<32s} {512.0 / best * 1e3:10.1f} rays/s  "
                f"{best:7.3f} ms/step  (repeats {'/'.join(f'{t:.3f}' for t in times)})",
                flush=True,
            )
        except Exception as e:
            print(f"  {label:<32s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    if results:
        compare(results)


def _chain(width, layers=8, m_total=65536, br=2048):
    ws = [
        jnp.asarray(np.random.default_rng(i).normal(0, 0.05, (width, width)), jnp.float32)
        for i in range(layers)
    ]
    x = jnp.asarray(
        np.random.default_rng(99).normal(0, 1, (m_total, width)), jnp.float32
    )

    def kernel(x_ref, *refs):
        w_refs, (o_ref,) = refs[:layers], refs[layers:]
        h = x_ref[:]
        for i in range(layers):
            h = jax.lax.dot_general(
                h, w_refs[i][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = h

    call = pl.pallas_call(
        kernel,
        grid=(m_total // br,),
        in_specs=[
            pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec((width, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
                for _ in ws
            ],
        ],
        out_specs=pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_total, width), jnp.float32),
    )
    jitted = jax.jit(lambda xx: call(xx, *ws))
    gflop = m_total * layers * width * width * 2 / 1e9
    return (lambda: jitted(x)), gflop


def phase_e():
    print("=== Phase E: layer-width roofline probe (dots-only chains) ===", flush=True)
    for width, br, m in ((256, 2048, 65536), (512, 1024, 32768), (1024, 512, 16384)):
        thunk, gflop = _chain(width, br=br, m_total=m)
        label = f"chain 8x[{width}x{width}] m={m}"
        try:
            best, reps = time_ms(thunk, iters=30)
            report(f"{label}  [{gflop / best:6.1f} TF/s]", best, reps)
        except Exception as e:
            print(f"  {label:<52s} FAILED: {str(e)[:160]}", flush=True)


def phase_f():
    """Scoped-vmem titration: 64 MiB regressed the step 13.43 -> 14.09 ms
    (the bigger budget changes XLA's scheduling for the worse) while
    unlocking all three blocked configs to ~neutral.  The wall was only
    +780 KB — probe SMALL raises for a schedule-preserving unlock."""
    print("=== Phase F: scoped-vmem titration ===", flush=True)
    configs = {
        "defaults+vmem18M": (None, 18432),
        "imp64+refine64+vmem18M": (
            {"importance_block_rays": 64, "shadow_refine_block_rays": 64}, 18432
        ),
        "sdfbwd256+vmem18M": ({"core_block_pts_bwd": 256}, 18432),
    }
    results = {}
    for label, (overrides, vmem) in configs.items():
        try:
            rays = bench._measure(
                "auto", 512, 16,
                renderer_overrides=overrides,
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": vmem},
            )
            ms = 512.0 / rays * 1e3
            results[label] = ms
            print(f"  {label:<28s} {rays:10.1f} rays/s  {ms:7.3f} ms/step", flush=True)
        except Exception as e:
            print(f"  {label:<28s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    if results:
        compare(results)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["D", "E"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"D": phase_d, "E": phase_e, "F": phase_f}[p.upper()]()
    print("done", flush=True)
