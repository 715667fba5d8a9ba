"""Round-4 session B: tiebreaks + block retries on top of the stash backward.

1. stash/bitonic vs stash/rank, TWICE each (the session-A in-step grid had
   rank 0.19 ms ahead of bitonic against every isolated number — decide
   with repeats; also now picks up the color-trunk bwd-512 default).
2. march block retries under the leaner stash backward: does the
   scoped-vmem wall that pinned importance_block=32 / refine_block=32
   move now that the core backward kernel is smaller?
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from bench import _measure


def run(label, **renderer_overrides):
    try:
        t0 = time.time()
        rays = _measure("auto", 512, 16, renderer_overrides=renderer_overrides)
        print(
            f"{label:56s} {rays:10.0f} rays/s  ({512/rays*1e3:.2f} ms/step)"
            f"  [{time.time()-t0:.0f}s]",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{label:56s} FAILED: {type(e).__name__}: {msg}", flush=True)


def main():
    for rep in (1, 2):
        run(f"stash/bitonic colorbwd512 rep{rep}")
        run(f"stash/rank colorbwd512 rep{rep}", march_merge="rank")
    run("stash/bitonic refine_block=64", shadow_refine_block_rays=64)
    run("stash/bitonic importance_block=64", importance_block_rays=64)


if __name__ == "__main__":
    main()
