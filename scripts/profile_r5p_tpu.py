"""Round-5 phase P: eval chunk-size re-sweep under eval_reflectance_impl
="xla" (device-only).  The 512 optimum was measured with the Pallas trunk
(whose block sizing prefers small chunks); the XLA trunk streams the full
chunk, so larger chunks may now amortize better.

Usage: python scripts/profile_r5p_tpu.py
"""
from __future__ import annotations

import dataclasses

import jax

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
import nrhints_tpu.eval.evaluator as eval_mod
import __graft_entry__
from scripts._profile_util import compare, time_ms

enable_compilation_cache()

N = 65536


def main():
    print("=== Phase P: eval chunk sweep, xla eval trunk, device-only ===",
          flush=True)
    results = {}
    for chunk in (512, 1024, 2048):
        cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=N)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, inference_chunk_size=chunk),
        )
        side = int(N ** 0.5)
        pixels = jax.tree_util.tree_map(
            lambda a: a.reshape((side, side) + a.shape[1:]), pixels)
        ev = eval_mod.Evaluator(cfg, camera, buffers, mesh=None)
        batched, _ = ev._chunk_and_shard(pixels.flatten(), N)

        def dev_only(ev=ev, batched=batched, params=params):
            return ev._render_image_jit(params, batched)["rgb"]

        try:
            best, reps = time_ms(dev_only, iters=4, warmup=2)
            results[f"chunk {chunk}"] = best
            print(f"  chunk {chunk:<6d} {best:9.1f} ms  {N / best * 1e3:10.1f} "
                  f"rays/s (repeats {'/'.join(f'{r:.1f}' for r in reps)})",
                  flush=True)
        except Exception as e:
            print(f"  chunk {chunk:<6d} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    compare(results)


if __name__ == "__main__":
    print(f"jax {jax.__version__}  devices {jax.devices()}", flush=True)
    main()
    print("done", flush=True)
