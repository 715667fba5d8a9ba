"""Round-5 phase I: the shipping-default decision session.

Settles phase H's close call (sweep=xla 12.795/12.802 vs +rounds=xla
12.464/12.524 — separated but <3%) with 3 same-session repeats each, and
adds the remaining candidates: machinery blocks 64 vs 128, and the
all-XLA shadow (final="xla" + bf16 march dtype, the isolated winner).

Usage: python scripts/profile_r5i_tpu.py
"""
from __future__ import annotations

import jax

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator  # noqa: F401
import __graft_entry__  # noqa: F401
import bench
from scripts._profile_util import compare

enable_compilation_cache()

CONFIGS = {
    "sweep=xla": {"march_sweep_impl": "xla"},
    "sweep+rounds=xla br64": {
        "march_sweep_impl": "xla",
        "march_rounds_impl": "xla",
        "importance_block_rays": 64,
        "shadow_refine_block_rays": 64,
    },
    "sweep+rounds=xla br128": {
        "march_sweep_impl": "xla",
        "march_rounds_impl": "xla",
        "importance_block_rays": 128,
        "shadow_refine_block_rays": 128,
    },
    "all-xla bf16 br128": {
        "march_sweep_impl": "xla",
        "march_rounds_impl": "xla",
        "shadow_final_impl": "xla",
        "march_dtype": "bfloat16",
        "importance_block_rays": 128,
        "shadow_refine_block_rays": 128,
    },
}


def main():
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    print("=== Phase I: shipping-default decision (3 repeats each) ===", flush=True)
    results = {}
    for label, overrides in CONFIGS.items():
        try:
            times = []
            for _ in range(3):
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
    main()
