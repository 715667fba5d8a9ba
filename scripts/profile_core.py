"""Piecewise timing of the primary render core's constituents at the
flagship shape (512 rays x 128 samples = 65536 points).

Answers: how much of the ~15 ms no-hints step is (a) the SDF
value+feat+grad forward, (b) its backward (the nested AD), (c) the color
MLP fwd/bwd, and how much remat / bf16 saved-activations can win.
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

from nrhints_tpu.fields.reflectance import ReflectanceNetConfig, reflectance_forward, reflectance_init
from nrhints_tpu.fields.sdf import (
    SDFNetConfig,
    sdf_init,
    sdf_only,
    sdf_value_feat_grad,
)


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
    ccfg = ReflectanceNetConfig()
    key = jax.random.PRNGKey(0)
    sdf_params = sdf_init(jax.random.PRNGKey(1), scfg)
    color_params = reflectance_init(jax.random.PRNGKey(2), ccfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pl_ = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(N, 256)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    vis = jnp.abs(jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32)))
    spec = jnp.abs(jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)))

    res = {}

    # (a) sdf_only forward (what one march round costs per point, no grad)
    f_only = jax.jit(lambda: sdf_only(sdf_params, scfg, x))
    res["sdf_only_fwd"] = timed(f_only)

    # (b) sdf value+feat+inputgrad forward (the render-core forward)
    f_vfg = jax.jit(lambda: sdf_value_feat_grad(sdf_params, scfg, x)[0])
    res["sdf_value_feat_grad_fwd"] = timed(f_vfg)

    # (c) full nested backward: d/dparams of a scalar of (sdf, feat, grad)
    def loss_sdf(p):
        s, ft, g = sdf_value_feat_grad(p, scfg, x)
        return jnp.sum(s) + jnp.sum(ft * 1e-3) + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    g_sdf = jax.jit(lambda: jax.grad(loss_sdf)(sdf_params)["lin0"]["g"])
    res["sdf_vfg_fwd+bwd"] = timed(g_sdf)

    # (c2) same but with remat around the field
    def loss_sdf_remat(p):
        s, ft, g = jax.checkpoint(
            lambda p_, x_: sdf_value_feat_grad(p_, scfg, x_), static_argnums=()
        )(p, x)
        return jnp.sum(s) + jnp.sum(ft * 1e-3) + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    g_sdf_r = jax.jit(lambda: jax.grad(loss_sdf_remat)(sdf_params)["lin0"]["g"])
    res["sdf_vfg_fwd+bwd_remat"] = timed(g_sdf_r)

    # (d) color MLP fwd and fwd+bwd
    f_color = jax.jit(
        lambda: reflectance_forward(color_params, ccfg, x, nrm, v, feat, pl_, vis, spec)
    )
    res["color_fwd"] = timed(f_color)

    def loss_color(p):
        c = reflectance_forward(p, ccfg, x, nrm, v, feat, pl_, vis, spec)
        return jnp.sum(c)

    g_color = jax.jit(lambda: jax.grad(loss_color)(color_params)["lin0"]["g"])
    res["color_fwd+bwd"] = timed(g_color)

    for k, v_ in res.items():
        print(f"{k:28s} {v_:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
