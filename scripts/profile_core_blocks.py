"""Block-size sweep for the fused with-grad core kernels on the live backend.

Times the fused SDF core (value+feat+grad) forward and full VJP at several
(block_pts, block_pts_bwd) choices, plus the fused reflectance trunk, to pick
the best grid granularity.  Timing discipline per CLAUDE.md: jitted, >=4
warmups, scalar readback.
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


def timed(fn, iters=20, warmup=4):
    for _ in range(warmup):
        r = fn()
        jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), r)
    return (time.perf_counter() - t0) / iters


def main():
    from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
    from nrhints_tpu.kernels.core_mlp import fused_sdf_value_feat_grad

    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    n = 512 * 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 0.3

    print(f"points: {n}")

    for bp, bpb in [(256, 128), (512, 256), (1024, 512), (512, 128), (1024, 256), (2048, 512)]:
        f = functools.partial(
            fused_sdf_value_feat_grad, params, cfg, x,
            block_pts=bp, block_pts_bwd=bpb,
        )

        @jax.jit
        def fwd_only():
            s, ft, g = f()
            return s.sum() + ft.sum() + g.sum()

        @jax.jit
        def fwd_bwd():
            def loss(p):
                s, ft, g = fused_sdf_value_feat_grad(
                    p, cfg, x, block_pts=bp, block_pts_bwd=bpb
                )
                # touch all three outputs incl. the grad (eikonal-style)
                return s.sum() + 0.1 * ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean() + 1e-3 * ft.sum()

            return jax.grad(loss)(params)["lin0"]["g"].sum()

        try:
            t_f = timed(fwd_only)
            t_fb = timed(fwd_bwd)
            print(f"bp={bp:5d} bpb={bpb:4d}  fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bp={bp:5d} bpb={bpb:4d}  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
