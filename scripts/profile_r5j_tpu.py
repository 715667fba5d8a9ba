"""Round-5 phase J: scan-amortized (de-confounded) component budget + the
bf16-XLA-sweep in-step test.

The ~0.615 ms fixed per-dispatch tunnel cost inflated every isolated
kernel number; here each component runs K=8 iterations inside ONE jit
(lax.scan with a data-dependent perturbation so XLA cannot CSE the
iterations) and reports per-iteration time.  J2 re-tests
march_dtype="bfloat16" on the shipped config: amortized XLA chains show
f32-softplus at ~half the bf16 rate, so bf16 sweeps may win in-step
where the earlier (final=xla-contaminated) bf16 config tied.

Usage: python scripts/profile_r5j_tpu.py J1 J2
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march as march
import nrhints_tpu.kernels.core_mlp as core_mlp
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import __graft_entry__  # noqa: F401
import bench
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from scripts._profile_util import compare, report, time_ms

enable_compilation_cache()

K = 8


def _scanned(fn, x0):
    """K iterations of fn inside one jit; fn: x -> x' (same shape/dtype)."""

    @jax.jit
    def g(x):
        def body(h, _):
            return fn(h), None

        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    return lambda: g(x0)


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


def phase_j1():
    print(f"=== Phase J1: scan-{K}-amortized component budget (batch 512) ===", flush=True)
    cfg, params, o, d, z0, sdist = _march_inputs()
    ship_imp = dict(block_rays=128, split=True, sweep_impl="xla", rounds_impl="xla")
    ship_sh = dict(
        block_rays=16, split=True, refine_block_rays=128,
        sweep_impl="xla", rounds_impl="xla",
    )

    def imp_step(oc):
        z = march.fused_importance_z(params, cfg, oc, d, z0, **ship_imp)
        return oc + z[:, :3] * 1e-20  # data dependence defeats CSE

    best, reps = time_ms(_scanned(imp_step, o), iters=10)
    report("importance march (shipped)", best / K, [r / K for r in reps])

    def sh_step(oc):
        tau = march.fused_shadow_tau(
            params, cfg, oc, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(0.7),
            **ship_sh,
        )
        return oc + tau * 1e-20

    best, reps = time_ms(_scanned(sh_step, o), iters=10)
    report("shadow march (shipped)", best / K, [r / K for r in reps])

    # Core SDF op at the flagship per-step point count (512 rays x 128
    # samples = 65,536): forward alone and forward+backward.
    x = jnp.asarray(np.random.default_rng(3).normal(0, 0.4, (65536, 3)).astype(np.float32))

    def core_fwd(xc):
        s, f, g = core_mlp.fused_sdf_value_feat_grad(params, cfg, xc, backward="stash")
        return xc + g * 1e-20

    best, reps = time_ms(_scanned(core_fwd, x), iters=6)
    report("core sdf fwd (value+feat+grad)", best / K, [r / K for r in reps])

    def core_fwdbwd(xc):
        def loss(p):
            s, f, g = core_mlp.fused_sdf_value_feat_grad(p, cfg, xc, backward="stash")
            return jnp.sum(s) + jnp.sum(f) * 1e-3 + jnp.sum(g * g)

        gr = jax.grad(loss)(params)
        leaf = jax.tree_util.tree_leaves(gr)[0]
        return xc + jnp.sum(leaf) * 1e-20

    best, reps = time_ms(_scanned(core_fwdbwd, x), iters=6)
    report("core sdf fwd+bwd (stash)", best / K, [r / K for r in reps])

    # Amortized XLA sweep-chain dtype check (softplus chains, 8x256).
    for tag, dt in (("xla softplus chain f32", jnp.float32), ("xla softplus chain bf16", jnp.bfloat16)):
        ws = [
            jnp.asarray(np.random.default_rng(i).normal(0, 0.02, (256, 256)), dt)
            for i in range(8)
        ]
        xx = jnp.asarray(np.random.default_rng(9).normal(0, 1, (65536, 256)), jnp.float32)

        def chain(h0):
            h = h0.astype(dt)
            for w in ws:
                z = jax.lax.dot_general(
                    h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                h = (jax.nn.softplus(100.0 * z) * 0.01).astype(dt)
            return h.astype(jnp.float32) * 1e-10 + h0 * 0.5

        best, reps = time_ms(_scanned(chain, xx), iters=10)
        gf = 65536 * 8 * 256 * 256 * 2 / 1e9
        report(f"{tag}  [{gf / (best / K):6.1f} TF/s]", best / K, [r / K for r in reps])


def phase_j2():
    print("=== Phase J2: in-step march_dtype=bfloat16 (shipped config) ===", flush=True)
    configs = {
        "shipped (f32 sweeps)": None,
        "march_dtype=bfloat16": {"march_dtype": "bfloat16"},
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
                f"  {label:<28s} {512.0 / best * 1e3:10.1f} rays/s  {best:7.3f} ms"
                f"  (repeats {'/'.join(f'{t:.3f}' for t in times)})",
                flush=True,
            )
        except Exception as e:
            print(f"  {label:<28s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    if results:
        compare(results)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["J1", "J2"]
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    for p in phases:
        {"J1": phase_j1, "J2": phase_j2}[p.upper()]()
    print("done", flush=True)
