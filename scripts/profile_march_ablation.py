"""In-kernel ablation profile of the fused march kernels (live TPU).

Identifies where the 2.4 ms (importance) / 4.7 ms (shadow) actually go by
patching march.py's private round/MLP helpers per variant and re-tracing
the UNJITTED kernel wrapper under a fresh jax.jit (the module-level jit
would cache the unpatched trace).  Variants:

  base      shipping kernel
  maskalg   shippable exact rewrite: inverse-CDF one-hots derived from the
            existing prefix mask (cmp & ~roll(cmp)) instead of four
            iota+compare one-hot constructions; drops the index sum/clamp.
  relu      DIAGNOSTIC: softplus100 -> relu (bounds transcendental cost)
  nope      DIAGNOSTIC: positional encoding -> one broadcast (bounds the
            width-1 lane-concat cost of _pe_3d)
  stubround DIAGNOSTIC: _round_new_z -> fixed descending z (bounds the
            whole inverse-CDF machinery; MLP + merge remain)
  nomerge   DIAGNOSTIC: _bitonic_merge -> identity (bounds merge cost)
  mlponly   DIAGNOSTIC: stubround + nomerge (MLP sweeps alone)

maskalg output is asserted allclose vs base (it is exact math; see the
derivation in kernels/march.py).
"""
from __future__ import annotations

import contextlib
import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import nrhints_tpu.kernels.march as M  # noqa: E402
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init  # noqa: E402


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        r = fn()
        float(jnp.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


# --- variant patch bodies ---------------------------------------------------


def _round_new_z_maskalg(z, sdf, valid_n, inv_s, oo, od, n_new: int):
    """Exact rewrite of _round_new_z's tail: one-hots from the prefix mask."""
    br = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, M.N_BUF), 1)
    interval_valid = lane < (valid_n - 1)

    nxt_z = M._roll(z, -1, axis=1)
    nxt_s = M._roll(sdf, -1, axis=1)
    r2 = oo + 2.0 * od * z + z * z
    r2n = oo + 2.0 * od * nxt_z + nxt_z * nxt_z
    inside = jnp.logical_or(r2 < 1.0, r2n < 1.0).astype(z.dtype)

    mid_sdf = (sdf + nxt_s) * 0.5
    cos_val = (nxt_s - sdf) / (nxt_z - z + 1e-5)
    prev_cos = jnp.where(lane == 0, 0.0, M._roll(cos_val, 1, axis=1))
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside

    dist = nxt_z - z
    prev_e = mid_sdf - cos_val * dist * 0.5
    next_e = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_e * inv_s)
    next_cdf = jax.nn.sigmoid(next_e * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    alpha = jnp.minimum(alpha, 1.0)
    alpha = jnp.where(interval_valid, alpha, 0.0)

    trans = jnp.exp(M._tri_matmul_cumsum(jnp.log(1.0 - alpha + 1e-7), exclusive=True))
    w = alpha * trans

    pdf = jnp.where(interval_valid, w + 1e-5, 0.0)
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = M._tri_matmul_cumsum(pdf, exclusive=True)
    cdf_cnt = jnp.where(lane < valid_n, cdf, 2.0)

    ku = jax.lax.broadcasted_iota(jnp.int32, (1, n_new), 1).astype(jnp.float32)
    u = 1.0 - ku / (n_new - 1)
    cmp = (cdf_cnt[:, None, :] <= u[0][None, :, None]).astype(z.dtype)
    oh_b = cmp * (1.0 - M._roll(cmp, -1, axis=2))
    oh_a = M._roll(oh_b, 1, axis=2)
    cdf_b = jnp.sum(oh_b * cdf[:, None, :], axis=-1)
    cdf_a = jnp.sum(oh_a * cdf[:, None, :], axis=-1)
    z_b = jnp.sum(oh_b * z[:, None, :], axis=-1)
    z_a = jnp.sum(oh_a * z[:, None, :], axis=-1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return z_b + t * (z_a - z_b)


def _round_new_z_stub(z, sdf, valid_n, inv_s, oo, od, n_new: int):
    br = z.shape[0]
    ku = jax.lax.broadcasted_iota(jnp.int32, (br, n_new), 1).astype(jnp.float32)
    return 3.0 - ku * 0.01  # descending, no machinery


def _pe_3d_cheap(pts, num_freqs):
    width = 3 + 6 * num_freqs
    ones = jnp.ones((1, 1, width), pts.dtype)
    return pts[..., :1] * ones


VARIANTS = {
    "base": {},
    "maskalg": {"_round_new_z": _round_new_z_maskalg},
    "relu": {"_softplus100": lambda x: jnp.maximum(x, 0.0)},
    "nope": {"_pe_3d": _pe_3d_cheap},
    "stubround": {"_round_new_z": _round_new_z_stub},
    "nomerge": {"_bitonic_merge": lambda z, p: (z, p)},
    "mlponly": {
        "_round_new_z": _round_new_z_stub,
        "_bitonic_merge": lambda z, p: (z, p),
    },
}


@contextlib.contextmanager
def patched(names):
    saved = {k: getattr(M, k) for k in names}
    try:
        for k, v in names.items():
            setattr(M, k, v)
        yield
    finally:
        for k, v in saved.items():
            setattr(M, k, v)


def main():
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    batch = 512
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    sdist = jnp.full((batch, 1), 2.0 / 64)

    imp_static = ("cfg", "rounds", "n_new", "base_inv_s", "block_rays", "interpret", "mlp_dtype")
    results = {}
    for name, patches in VARIANTS.items():
        with patched(patches):
            fresh = jax.jit(M.fused_importance_z.__wrapped__, static_argnames=imp_static)
            f = functools.partial(fresh, params, cfg, o, d, z0)
            try:
                t = timed(f)
                results[name] = (t, np.asarray(f()))
                print(f"importance {name:10s} {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"importance {name:10s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "maskalg" in results and "base" in results:
        db = np.abs(results["maskalg"][1] - results["base"][1]).max()
        print(f"importance maskalg-vs-base max |dz| = {db:.3e}", flush=True)

    shd_static = ("cfg", "rounds", "n_new", "base_inv_s", "block_rays", "interpret", "mlp_dtype")
    sres = {}
    for name in ("base", "maskalg", "relu", "mlponly"):
        patches = dict(VARIANTS[name])
        if name == "relu":
            patches["softplus100_gate"] = lambda z: (
                jnp.maximum(z, 0.0),
                (z > 0.0).astype(jnp.float32),
            )
        with patched(patches):
            fresh = jax.jit(M.fused_shadow_tau.__wrapped__, static_argnames=shd_static)
            g = functools.partial(
                fresh, params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(1.0)
            )
            try:
                t = timed(g)
                sres[name] = (t, np.asarray(g()))
                print(f"shadow     {name:10s} {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"shadow     {name:10s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "maskalg" in sres and "base" in sres:
        db = np.abs(sres["maskalg"][1] - sres["base"][1]).max()
        print(f"shadow maskalg-vs-base max |dtau| = {db:.3e}", flush=True)




# --- second-stage diagnostics: split MLP cost from fixed overhead ----------


def _mlp_stub(pts, weights, cfg):
    return jnp.sum(pts, axis=-1)  # [BR, S]; keeps the data dependency


def _mlp_shallow(pts, weights, cfg):
    """2 hidden layers instead of 8 (diagnostic)."""
    import dataclasses

    cfg2 = dataclasses.replace(cfg, n_layers=2, skip_in=())
    ws = list(weights[:4]) + list(weights[-2:])
    return _ORIG_MLP(pts, ws, cfg2)


def second_stage():
    global _ORIG_MLP
    _ORIG_MLP = M._mlp_sdf_3d
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    batch = 512
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32)) * 0.1
    d = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (batch, 64))
    imp_static = ("cfg", "rounds", "n_new", "base_inv_s", "block_rays", "interpret", "mlp_dtype")
    variants = {
        "base": {},
        "nomlp": {"_mlp_sdf_3d": _mlp_stub},
        "shallow4": {"_mlp_sdf_3d": _mlp_shallow},
    }
    for name, patches in variants.items():
        brs = (32, 64) if name == "base" else (32, 64, 128, 256, 512)
        for br in brs:
            with patched(patches):
                fresh = jax.jit(M.fused_importance_z.__wrapped__, static_argnames=imp_static)
                f = functools.partial(fresh, params, cfg, o, d, z0, block_rays=br)
                try:
                    t = timed(f)
                    print(f"importance {name:9s} br={br:4d} {t*1e3:7.2f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"importance {name:9s} br={br:4d} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    import os
    if os.environ.get("MARCH_ABLATION_STAGE") == "2":
        second_stage()
    else:
        main()
