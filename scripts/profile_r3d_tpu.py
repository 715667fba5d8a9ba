"""Round-3 follow-up D: split shadow march INSIDE the full train step.

r3c phase C found that shadow_split=True with the isolated-sweep optimum
refine_block_rays=64 fails the step-level compile (scoped-vmem stack limit
exceeded by 772.5K when XLA co-schedules the refinement custom call with
surrounding fusions — the same wall as importance_block_rays=64, PROFILE.md
"Step-level caveat").  This measures the step with refine_block_rays=32,
the largest candidate left, vs the monolith baseline (16.06 ms @ 512).
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import _measure

    for overrides in (
        {"shadow_split": True, "shadow_refine_block_rays": 32},
        {"shadow_split": True, "shadow_refine_block_rays": 16},
    ):
        try:
            rays_per_sec = _measure(
                "auto", 512, steps_per_dispatch=16, renderer_overrides=overrides
            )
        except Exception as e:  # step-level compile failure is a data point
            print(
                "SPLIT " + json.dumps({"overrides": overrides, "error": str(e)[:200]}),
                flush=True,
            )
            continue
        print(
            "SPLIT "
            + json.dumps(
                {
                    "overrides": overrides,
                    "rays_per_sec": round(rays_per_sec, 1),
                    "ms_per_step": round(512 / rays_per_sec * 1e3, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
