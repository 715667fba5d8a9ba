"""Round-5 TPU profiling (VERDICT r4 Next #1/#2): the march MLP sweeps at
~30% MXU efficiency, and the per-jit scoped-vmem channel.

Phases (argv selects, default "A B C"):
  A — ``jax.jit(..., compiler_options={"xla_tpu_scoped_vmem_limit_kib"})``
      against the three step-level-blocked optima (importance block 64,
      shadow refine 64, SDF stash bwd 256).
  B — MLP sweep-rate micro-bench: an 8x[256->256] chain kernel swept over
      rows-per-grid-step, activation, and dtypes, vs the same chain as
      plain XLA — locates WHERE the 17.7 us/sweep-column goes.
  C — isolated march kernels: sweep_impl="xla" / final_impl="xla" (the
      initial + final sweeps as full-batch XLA matmuls) vs the all-Pallas
      split/monolith paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_r5_tpu.py
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

# Eager imports of every repo module this process touches: later edits to
# these files then cannot mix module versions mid-run (CLAUDE.md round-3
# lesson — python imports lazily).
from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march as march
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import __graft_entry__  # noqa: F401
import bench
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from scripts._profile_util import compare, force, report, time_ms

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

enable_compilation_cache()


# ---------------------------------------------------------------------------
# Phase A — per-jit compiler options vs the scoped-vmem wall


def phase_a():
    print("=== Phase A: per-jit xla_tpu_scoped_vmem_limit_kib ===", flush=True)
    blocked = {
        "defaults(no opts)": (None, None),
        "defaults+vmem64M": ({}, 65536),
        "imp_block64+vmem64M": ({"importance_block_rays": 64}, 65536),
        "refine64+vmem64M": ({"shadow_refine_block_rays": 64}, 65536),
        "sdfbwd256+vmem64M": ({"core_block_pts_bwd": 256}, 65536),
    }
    results = {}
    for label, (overrides, vmem) in blocked.items():
        opts = {"xla_tpu_scoped_vmem_limit_kib": vmem} if vmem else None
        try:
            rays = bench._measure(
                "auto", 512, 16,
                renderer_overrides=overrides or None,
                compiler_options=opts,
            )
            ms = 512.0 / rays * 1e3
            results[label] = ms
            print(f"  {label:<28s} {rays:10.1f} rays/s  {ms:7.3f} ms/step", flush=True)
        except Exception as e:  # compile failures are data here
            print(f"  {label:<28s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    if results:
        compare(results)


# ---------------------------------------------------------------------------
# Phase B — sweep-rate micro-bench

M_TOTAL = 65536
WIDTH = 256
LAYERS = 8
CHAIN_GFLOP = M_TOTAL * LAYERS * WIDTH * WIDTH * 2 / 1e9


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) * 0.01


def _chain_pallas(br, act, wdt, hdt):
    """8-layer [*,256]x[256,256] chain kernel -> timing thunk."""
    ws = [
        jnp.asarray(np.random.default_rng(i).normal(0, 0.05, (WIDTH, WIDTH)), wdt)
        for i in range(LAYERS)
    ]
    x = jnp.asarray(np.random.default_rng(99).normal(0, 1, (M_TOTAL, WIDTH)), jnp.float32)

    def kernel(x_ref, *refs):
        w_refs, (o_ref,) = refs[:LAYERS], refs[LAYERS:]
        h = x_ref[:].astype(hdt)
        for i in range(LAYERS):
            z = jax.lax.dot_general(
                h, w_refs[i][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if act:
                z = _softplus100(z)
            h = z.astype(hdt)
        o_ref[:] = h.astype(jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(M_TOTAL // br,),
        in_specs=[
            pl.BlockSpec((br, WIDTH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0), memory_space=pltpu.VMEM)
                for _ in ws
            ],
        ],
        out_specs=pl.BlockSpec((br, WIDTH), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_TOTAL, WIDTH), jnp.float32),
    )
    jitted = jax.jit(lambda xx: call(xx, *ws))
    return lambda: jitted(x)


def _chain_xla(act, dt):
    ws = [
        jnp.asarray(np.random.default_rng(i).normal(0, 0.05, (WIDTH, WIDTH)), dt)
        for i in range(LAYERS)
    ]
    x = jnp.asarray(np.random.default_rng(99).normal(0, 1, (M_TOTAL, WIDTH)), jnp.float32)

    @jax.jit
    def f(xx):
        h = xx.astype(dt)
        for w in ws:
            z = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            if act:
                z = _softplus100(z)
            h = z.astype(dt)
        return h.astype(jnp.float32)

    return lambda: f(x)


def _wide_dot_pallas(br, n_out):
    """One [br,256]x[256,n_out] dot per grid step — N-width rate probe."""
    w = jnp.asarray(np.random.default_rng(0).normal(0, 0.05, (WIDTH, n_out)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(99).normal(0, 1, (M_TOTAL, WIDTH)), jnp.float32)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    call = pl.pallas_call(
        kernel,
        grid=(M_TOTAL // br,),
        in_specs=[
            pl.BlockSpec((br, WIDTH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_TOTAL, n_out), jnp.float32),
    )
    jitted = jax.jit(lambda xx: call(xx, w))
    gflop = M_TOTAL * WIDTH * n_out * 2 / 1e9
    return (lambda: jitted(x)), gflop


def phase_b():
    print("=== Phase B: MLP sweep-rate micro-bench (65536 rows, 8x256) ===", flush=True)
    print(f"  chain = {CHAIN_GFLOP:.1f} GFLOP; v5e bf16 peak 197 TFLOP/s", flush=True)
    results = {}
    for br in (256, 512, 2048, 8192):
        for tag, act, wdt, hdt in (
            ("dots-only/f32", False, jnp.float32, jnp.float32),
            ("softplus/f32", True, jnp.float32, jnp.float32),
            ("softplus/bf16", True, jnp.bfloat16, jnp.bfloat16),
        ):
            label = f"pallas br={br:<5d} {tag}"
            try:
                best, reps = time_ms(_chain_pallas(br, act, wdt, hdt), iters=30)
                tf = CHAIN_GFLOP / best
                report(f"{label}  [{tf:6.1f} TF/s]", best, reps)
                results[label] = best
            except Exception as e:
                print(f"  {label:<52s} FAILED: {str(e)[:160]}", flush=True)
    for tag, act, dt in (
        ("dots-only/f32", False, jnp.float32),
        ("softplus/f32", True, jnp.float32),
        ("softplus/bf16", True, jnp.bfloat16),
    ):
        label = f"XLA full-batch {tag}"
        best, reps = time_ms(_chain_xla(act, dt), iters=30)
        tf = CHAIN_GFLOP / best
        report(f"{label}  [{tf:6.1f} TF/s]", best, reps)
        results[label] = best
    print("  -- N-width probe (single dot, f32) --", flush=True)
    for br, n_out in ((2048, 256), (2048, 512), (2048, 1024), (8192, 256)):
        thunk, gflop = _wide_dot_pallas(br, n_out)
        label = f"dot br={br} N={n_out}"
        try:
            best, reps = time_ms(thunk, iters=30)
            report(f"{label}  [{gflop / best:6.1f} TF/s]", best, reps)
        except Exception as e:
            print(f"  {label:<52s} FAILED: {str(e)[:160]}", flush=True)


# ---------------------------------------------------------------------------
# Phase C — march kernels: XLA sweeps vs Pallas sweeps


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


def phase_c():
    print("=== Phase C: march kernels, XLA vs Pallas sweeps (batch 512) ===", flush=True)
    cfg, params, o, d, z0, sdist = _march_inputs()

    imp_cfgs = {
        "imp mono b32 (default)": dict(block_rays=32),
        "imp split xla-sweep f32": dict(block_rays=32, split=True, sweep_impl="xla"),
        "imp split xla-sweep bf16": dict(
            block_rays=32, split=True, sweep_impl="xla", mlp_dtype="bfloat16"
        ),
    }
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
        "shadow split 16/32 (default)": dict(block_rays=16, split=True, refine_block_rays=32),
        "shadow split final=xla": dict(
            block_rays=16, split=True, refine_block_rays=32, final_impl="xla"
        ),
        "shadow split sweep=xla": dict(
            block_rays=16, split=True, refine_block_rays=32, sweep_impl="xla"
        ),
        "shadow split both=xla": dict(
            block_rays=16, split=True, refine_block_rays=32,
            sweep_impl="xla", final_impl="xla",
        ),
        "shadow split both=xla bf16": dict(
            block_rays=16, split=True, refine_block_rays=32,
            sweep_impl="xla", final_impl="xla", mlp_dtype="bfloat16",
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


if __name__ == "__main__":
    phases = sys.argv[1:] or ["A", "B", "C"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"A": phase_a, "B": phase_b, "C": phase_c}[p.upper()]()
    print("done", flush=True)
