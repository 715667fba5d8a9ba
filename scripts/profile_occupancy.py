"""Occupancy curve: train-step throughput vs rays/chip, fused on AND off.

VERDICT r2 item 2: PROFILE.md's central conclusion ("remaining headroom is
occupancy, not kernel quality") and BASELINE.md's scale-global-batch recipe
rest on a batch sweep whose numbers were never persisted.  This script
measures the full flagship train step (fwd + bwd + Adam, steps_per_dispatch
scan) at 512/1024/2048/4096 rays on the real chip for both the fused-Pallas
and pure-XLA paths, and prints a markdown table + one JSON line per point.

Run (background-safe, single process so the per-process axon session cost
is paid once):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_occupancy.py
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

    from bench import FLAGSHIP_FLOPS_PER_RAY, TPU_V5E_BF16_PEAK_TFLOPS, _measure

    rows = []
    # Fused-on first so partial results carry the headline curve.
    for fused in ("auto", "off"):
        for batch in (512, 1024, 2048, 4096):
            t0 = time.perf_counter()
            rays_per_sec = _measure(fused, batch, steps_per_dispatch=16)
            wall = time.perf_counter() - t0
            mfu = rays_per_sec * FLAGSHIP_FLOPS_PER_RAY / 1e12 / TPU_V5E_BF16_PEAK_TFLOPS
            row = {
                "fused": fused,
                "batch": batch,
                "rays_per_sec": round(rays_per_sec, 1),
                "ms_per_step": round(batch / rays_per_sec * 1e3, 2),
                "mfu_bf16_peak": round(mfu, 4),
                "measure_wall_s": round(wall, 1),
            }
            rows.append(row)
            print("POINT " + json.dumps(row), flush=True)

    print("\n| path | rays/step | rays/s/chip | ms/step | MFU |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for r in rows:
        path = "fused" if r["fused"] == "auto" else "pure XLA"
        print(
            f"| {path} | {r['batch']} | {r['rays_per_sec']:,.0f} | "
            f"{r['ms_per_step']} | {r['mfu_bf16_peak']*100:.1f}% |",
            flush=True,
        )


if __name__ == "__main__":
    main()
