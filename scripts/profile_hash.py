"""Hash-encoding throughput measurement (round-1 verdict item 6).

Measures flagship train-step rays/s with the Instant-NGP hash-encoded SDF
(XLA gather path — the fused Pallas core/march kernels are
frequency-encoding-specific and fall back automatically, renderer.py
``_fused_march_compatible``) against the frequency-encoded fused and
pure-XLA paths.  Results recorded in PROFILE.md.

    python scripts/profile_hash.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from bench import _measure  # noqa: E402


def main() -> None:
    batch, k = 512, 16
    rows = [
        ("frequency + fused kernels (shipping path)", "auto", "frequency", None),
        ("frequency, pure XLA", "off", "frequency", None),
        ("hash L16/F2 (reference defaults)", "auto", "hash", None),
        # Same 32-d output, half the gather/scatter rows: the gather cost is
        # ~5 ns/row and scatter ~40 ns/row regardless of row width
        # (outputs/r2/probe_gather2), so fewer, fatter rows win.
        ("hash L8/F4 (TPU-leaning hyperparams)", "auto", "hash",
         dict(hash_levels=8, hash_features_per_level=4)),
    ]
    for label, fused, enc, sdf_overrides in rows:
        r = _measure(fused, batch, k, encoding=enc, sdf_overrides=sdf_overrides)
        print(f"{label:48s} {r:10.1f} rays/s", flush=True)


if __name__ == "__main__":
    main()
