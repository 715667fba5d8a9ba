"""TPU timing: fused custom-VJP core ops vs the XLA path at 65536 points."""
from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.core.encodings import nerf_encoding
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig, reflectance_forward, reflectance_init
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init, sdf_value_feat_grad
from nrhints_tpu.kernels.core_mlp import fused_reflectance_forward, fused_sdf_value_feat_grad


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


DT = "bfloat16"


def main():
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

    res = {}
    for bp in (128, 256):
        f = jax.jit(lambda bp=bp: fused_sdf_value_feat_grad(sdf_params, scfg, x, block_pts=bp, compute_dtype=DT)[0])
        res[f"fused_sdf_fwd_bp{bp}"] = timed(f)

        def loss(p, bp=bp):
            s, ft, g = fused_sdf_value_feat_grad(p, scfg, x, block_pts=bp, block_pts_bwd=bp//2, compute_dtype=DT)
            return jnp.sum(s) + jnp.sum(ft * 1e-3) + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        gf = jax.jit(lambda bp=bp: jax.grad(lambda p: loss(p, bp))(sdf_params)["lin0"]["g"])
        res[f"fused_sdf_fwd+bwd_bp{bp}"] = timed(gf)

    for bp in (256, 512):
        def closs(p, bp=bp):
            c = fused_reflectance_forward(p, ccfg, x, nrm, v, feat_in, pl_, vis, spec, block_pts=bp, block_pts_bwd=bp//2, compute_dtype=DT)
            return jnp.sum(c)

        gc = jax.jit(lambda bp=bp: jax.grad(lambda p: closs(p, bp))(color_params)["lin0"]["g"])
        res[f"fused_color_fwd+bwd_bp{bp}"] = timed(gc)

    for k, val in res.items():
        print(f"{k:28s} {val:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
