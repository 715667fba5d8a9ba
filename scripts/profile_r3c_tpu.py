"""Round-3 follow-up TPU batch (one process, one axon session):

A. Single-chip verify drive: jit a small flagship render + one train step
   on the real chip (the /verify recipe's library-surface check).
B. Small-batch occupancy points (64/128/256 rays, fused): the
   constant-global-batch multi-chip regime — 512 global rays on 8 chips is
   64 rays/chip.  Quantifies the per-chip falloff that scale_global_batch
   and the 2-D ('data','sample') mesh exist to fix.
C. Split-shadow-march step measurement (shadow_split=True) at 512: decides
   whether the split march becomes the shipping default (isolated-kernel
   sweep says 4.52 vs 4.73 ms — PROFILE.md "Split shadow march").

Run: PYTHONPATH=<snapshot>:/root/.axon_site python scripts/profile_r3c_tpu.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP_FLOPS_PER_RAY, TPU_V5E_BF16_PEAK_TFLOPS, _measure

    # --- A: verify drive --------------------------------------------------
    from __graft_entry__ import entry

    fn, (params, pixels) = entry()
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    rgb = jfn(params, pixels)
    first = float(jnp.mean(rgb))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        rgb = jfn(params, pixels)
    mean = float(jnp.mean(rgb))
    t_steady = (time.perf_counter() - t0) / 3
    finite = bool(jnp.isfinite(rgb).all())
    print(
        "VERIFY "
        + json.dumps(
            {
                "forward_mean_rgb": round(mean, 6),
                "finite": finite,
                "compile_s": round(t_compile, 1),
                "steady_ms": round(t_steady * 1e3, 2),
                "platform": jax.devices()[0].platform,
                "device_kind": jax.devices()[0].device_kind,
            }
        ),
        flush=True,
    )
    assert finite, "non-finite rgb on the real chip"

    # --- B: small-batch occupancy ----------------------------------------
    for batch in (64, 128, 256):
        rays_per_sec = _measure("auto", batch, steps_per_dispatch=16)
        mfu = rays_per_sec * FLAGSHIP_FLOPS_PER_RAY / 1e12 / TPU_V5E_BF16_PEAK_TFLOPS
        print(
            "POINT "
            + json.dumps(
                {
                    "fused": "auto",
                    "batch": batch,
                    "rays_per_sec": round(rays_per_sec, 1),
                    "ms_per_step": round(batch / rays_per_sec * 1e3, 2),
                    "mfu_bf16_peak": round(mfu, 4),
                }
            ),
            flush=True,
        )

    # --- C: split shadow march at the bench operating points --------------
    for batch in (512, 4096):
        rays_per_sec = _measure(
            "auto", batch, steps_per_dispatch=16,
            renderer_overrides={"shadow_split": True},
        )
        print(
            "SPLIT "
            + json.dumps(
                {
                    "batch": batch,
                    "rays_per_sec": round(rays_per_sec, 1),
                    "ms_per_step": round(batch / rays_per_sec * 1e3, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
