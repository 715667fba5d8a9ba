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
        ("frequency + fused kernels (shipping path)", "auto", "frequency"),
        ("frequency, pure XLA", "off", "frequency"),
        ("hash (XLA gather; kernels auto-fallback)", "auto", "hash"),
    ]
    for label, fused, enc in rows:
        r = _measure(fused, batch, k, encoding=enc)
        print(f"{label:48s} {r:10.1f} rays/s", flush=True)


if __name__ == "__main__":
    main()
