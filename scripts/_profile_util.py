"""Shared timing utilities for the scripts/profile_* harnesses.

Timing discipline (CLAUDE.md): everything jitted, >=4 warmup calls, and a
SCALAR READBACK to force completion (``block_until_ready`` is unreliable
over the axon tunnel).  VERDICT r4 Next #7: session-to-session jitter is
~±0.2 ms, so every measurement here takes N>=2 same-session repeats and
prints all of them — and ``compare`` REFUSES to declare a single-shot
winner for any A/B within ``close_frac`` (default 3%): it re-times both
sides and reports the close call explicitly.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax.numpy as jnp


def force(x) -> float:
    """Scalar readback that forces the whole computation chain."""
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x))


def time_ms(
    fn: Callable[[], object],
    *,
    warmup: int = 4,
    iters: int = 20,
    repeats: int = 2,
) -> tuple[float, list[float]]:
    """(best_ms, all_repeat_ms) for one call of ``fn`` (which returns a
    device value).  The timed loop dispatches ``iters`` calls back-to-back
    and forces ONE readback at the end — per-iteration readbacks would add
    a full tunnel round trip (~25 ms!) to every call; async dispatch hides
    it when the device is the bottleneck (the methodology every PROFILE.md
    number uses).  ``repeats`` timed blocks run back-to-back in THIS
    session; the best is the steady-state estimate, the spread the jitter
    bound."""
    for _ in range(warmup):
        force(fn())
    out = []
    for _ in range(max(2, repeats)):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn()
        force(r)
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return min(out), out


def report(label: str, best: float, reps: Sequence[float]) -> None:
    reps_s = "/".join(f"{r:.3f}" for r in reps)
    print(f"  {label:<52s} {best:8.3f} ms  (repeats {reps_s})", flush=True)


def compare(results: dict[str, float], close_frac: float = 0.03) -> str:
    """Name the winner among {label: best_ms}; if the top two are within
    ``close_frac``, refuse a single-shot verdict and say so (the caller
    already printed every repeat via ``report``)."""
    order = sorted(results.items(), key=lambda kv: kv[1])
    if len(order) >= 2:
        a, b = order[0], order[1]
        if b[1] > 0 and (b[1] - a[1]) / b[1] < close_frac:
            msg = (
                f"CLOSE CALL (<{close_frac * 100:.0f}%): {a[0]}={a[1]:.3f} ms vs "
                f"{b[0]}={b[1]:.3f} ms — treat as a tie unless the repeats above "
                f"separate cleanly; do NOT ship a default off this alone"
            )
            print("  " + msg, flush=True)
            return msg
    print(f"  WINNER: {order[0][0]} = {order[0][1]:.3f} ms", flush=True)
    return order[0][0]
