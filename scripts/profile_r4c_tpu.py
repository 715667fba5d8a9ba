"""Round-4 session C: does raising --xla_tpu_scoped_vmem_limit_kib unlock
the march block sizes that fail the step-level compile (importance 64 /
refine 64 — isolated optima in r3), and are they faster once unlocked?

Run with e.g.:
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=<N>" python scripts/profile_r4c_tpu.py
(The axon terminal forwards session XLA_FLAGS to the remote compiler.)
"""
from __future__ import annotations

import os
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
    print("XLA_FLAGS =", os.environ.get("XLA_FLAGS"), flush=True)
    run("baseline (blocks 32/16+32)")
    run("refine_block=64", shadow_refine_block_rays=64)
    run("importance_block=64", importance_block_rays=64)
    run("both 64", shadow_refine_block_rays=64, importance_block_rays=64)


if __name__ == "__main__":
    main()
