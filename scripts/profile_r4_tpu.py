"""Round-4 TPU measurement batch (one process — the axon session cost is
minutes; CLAUDE.md).

Phase A: isolated march kernels, bitonic vs rank merge (+ the now-default
         shared one-hot gathers), batch 512.
Phase B: isolated core ops, recompute vs stash backward, 65k points,
         backward blocks 128/256.
Phase C: full train step (bench._measure) over the {core_backward} x
         {march_merge} grid; plus stash with bwd block 256 if it compiles.

Every result prints+flushes immediately; each phase is exception-isolated
so a Mosaic compile failure in one variant doesn't lose the rest.
"""
from __future__ import annotations

import pathlib
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from nrhints_tpu.fields.reflectance import ReflectanceNetConfig, reflectance_init
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from nrhints_tpu.kernels.core_mlp import (
    fused_reflectance_forward,
    fused_sdf_value_feat_grad,
)
from nrhints_tpu.kernels.march import fused_importance_z, fused_shadow_tau

DT = "bfloat16"


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def guard(label, fn):
    try:
        t = fn()
        print(f"{label:52s} {t:8.2f} ms", flush=True)
        return t
    except Exception as e:  # noqa: BLE001 — measurement probe, record + go on
        msg = str(e).split("\n")[0][:140]
        print(f"{label:52s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None


def phase_a():
    print("=== Phase A: march kernels, bitonic vs rank merge ===", flush=True)
    scfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(1), scfg)
    rng = np.random.default_rng(0)
    B = 512
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)) * 0.1
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (B, 64))
    sdist = jnp.full((B, 1), 2.0 / 64)
    invs, anneal = jnp.asarray(64.0), jnp.asarray(1.0)

    for merge in ("bitonic", "rank"):
        for br in (32, 64):
            guard(
                f"importance merge={merge} block={br}",
                lambda m=merge, b=br: timed(
                    jax.jit(
                        lambda: fused_importance_z(
                            params, scfg, o, d, z0, block_rays=b, merge=m
                        )
                    )
                ),
            )
        guard(
            f"shadow split merge={merge} final=16 refine=32",
            lambda m=merge: timed(
                jax.jit(
                    lambda: fused_shadow_tau(
                        params, scfg, o, d, z0, sdist, invs, anneal,
                        block_rays=16, split=True, refine_block_rays=32, merge=m,
                    )
                )
            ),
        )


def phase_b():
    print("=== Phase B: core ops, recompute vs stash backward ===", flush=True)
    N = 512 * 128
    scfg = SDFNetConfig()
    ccfg = ReflectanceNetConfig()
    sdf_params = sdf_init(jax.random.PRNGKey(1), scfg)
    color_params = reflectance_init(jax.random.PRNGKey(2), ccfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pl_ = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    feat_in = jnp.asarray(rng.normal(size=(N, 256)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    vis = jnp.abs(jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32)))
    spec = jnp.abs(jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)))

    def sdf_loss(p, backward, bwd_bp):
        s, ft, g = fused_sdf_value_feat_grad(
            p, scfg, x,
            block_pts=256, block_pts_bwd=bwd_bp,
            compute_dtype=DT, backward=backward,
        )
        return jnp.sum(s) + jnp.sum(ft * 1e-3) + jnp.sum(
            (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
        )

    for backward in ("recompute", "stash"):
        guard(
            f"sdf fwd only backward={backward}",
            lambda bk=backward: timed(
                jax.jit(
                    lambda: fused_sdf_value_feat_grad(
                        sdf_params, scfg, x, block_pts=256,
                        compute_dtype=DT, backward=bk,
                    )[0]
                )
            ),
        )
        for bwd_bp in (128, 256):
            guard(
                f"sdf fwd+bwd backward={backward} bwd_bp={bwd_bp}",
                lambda bk=backward, bb=bwd_bp: timed(
                    jax.jit(
                        lambda: jax.grad(lambda p: sdf_loss(p, bk, bb))(
                            sdf_params
                        )["lin0"]["g"]
                    )
                ),
            )

    def color_loss(p, backward, bwd_bp):
        c = fused_reflectance_forward(
            p, ccfg, x, nrm, v, feat_in, pl_, vis, spec,
            block_pts=512, block_pts_bwd=bwd_bp,
            compute_dtype=DT, backward=backward,
        )
        return jnp.sum(c)

    for backward in ("recompute", "stash"):
        for bwd_bp in (256, 512):
            guard(
                f"color fwd+bwd backward={backward} bwd_bp={bwd_bp}",
                lambda bk=backward, bb=bwd_bp: timed(
                    jax.jit(
                        lambda: jax.grad(lambda p: color_loss(p, bk, bb))(
                            color_params
                        )["lin0"]["g"]
                    )
                ),
            )


def phase_c():
    print("=== Phase C: full train step grid ===", flush=True)
    from bench import _measure

    grid = [
        ("recompute", "bitonic", 128),  # shipping control
        ("stash", "bitonic", 128),
        ("recompute", "rank", 128),
        ("stash", "rank", 128),
        ("stash", "bitonic", 256),
    ]
    for core_backward, march_merge, bwd_bp in grid:
        label = f"step core={core_backward}/bp{bwd_bp} merge={march_merge}"
        try:
            t0 = time.time()
            rays = _measure(
                "auto", 512, 16,
                renderer_overrides=dict(
                    core_backward=core_backward,
                    march_merge=march_merge,
                    core_block_pts_bwd=bwd_bp,
                ),
            )
            print(
                f"{label:52s} {rays:10.0f} rays/s  ({512/rays*1e3:.2f} ms/step)"
                f"  [{time.time()-t0:.0f}s incl compile]",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"{label:52s} FAILED: {type(e).__name__}: {msg}", flush=True)


def main():
    for phase in (phase_a, phase_b, phase_c):
        try:
            phase()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"phase {phase.__name__} aborted; continuing", flush=True)


if __name__ == "__main__":
    main()
