"""Probe: can per-row async-DMA gather from an HBM-resident hash table beat
XLA's ~5 ns/row gather on TPU?  (VERDICT r3 Missing #4 / Next #5.)

Round 2 established that Mosaic's VECTOR gather (`tpu.dynamic_gather`)
cannot express a table lookup.  This probe measures the OTHER mechanism —
scalar-prefetched indices (PrefetchScalarGridSpec) + in-kernel
`pltpu.make_async_copy` row DMAs from a `memory_space=ANY` (HBM) table —
at several pipeline depths, against the XLA row-gather baseline at the
same shapes.

The hash-encoded SDF needs ~8.4M gathered rows per train step (PROFILE.md
"SDF encoding"); XLA moves them at ~5 ns/row (~42 ms).  For DMA gather to
matter it must substantially beat that; rows/s is the verdict metric.

Run on the real chip:  python scripts/probe_hash_dma.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def _time_call(fn, *args, iters=8, warmup=4):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(out[..., 0]))  # scalar readback (tunnel-safe timing)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[..., 0]))
    return (time.perf_counter() - t0) / iters


def make_dma_gather(n_rows_out: int, feat: int, block: int, depth: int):
    """Gather rows of an HBM table by index via per-row async DMA.

    One grid step handles ``block`` rows; ``depth`` DMAs are kept in flight
    (round-robin semaphores).  Indices ride scalar prefetch (SMEM).
    """
    n_blocks = n_rows_out // block

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * block

        def mk(j, slot):
            idx = idx_ref[base + j]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx, 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot % depth],
            )

        # Prologue: fill the pipeline.
        for j in range(depth):
            mk(j, j).start()

        def body(j, _):
            mk(j, j).wait()

            @pl.when(j + depth < block)
            def _():
                mk(j + depth, j + depth).start()

            return 0

        jax.lax.fori_loop(0, block, body, 0)
        out_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec(
            (block, feat), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block, feat), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows_out, feat), jnp.float32),
        )(idx, table)

    return run


def make_dma_gather_chunked(n_rows_out: int, feat: int, block: int, chunk: int):
    """Contiguous-chunk control: DMA ``chunk`` adjacent rows per copy.
    Measures DMA issue overhead vs bytes (chunk=1 == the gather above with
    depth 1; large chunk approaches streaming bandwidth)."""
    n_blocks = n_rows_out // block
    n_chunks = block // chunk

    def kernel(idx_ref, table_ref, out_ref, scratch, sem):
        base = pl.program_id(0) * block

        def body(c, _):
            idx = idx_ref[base + c * chunk]
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(idx, chunk), :],
                scratch.at[pl.ds(c * chunk, chunk), :],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (block, feat), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block, feat), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows_out, feat), jnp.float32),
        )(idx, table)

    return run


def main():
    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    table_rows = 1 << 19
    results = {}

    for feat in (8, 128):
        table = jnp.asarray(rng.normal(size=(table_rows, feat)).astype(np.float32))
        n = 1 << 17  # 131,072 gathered rows
        idx = jnp.asarray(rng.integers(0, table_rows, size=(n,)).astype(np.int32))

        # XLA baseline
        @jax.jit
        def xla_gather(i, t):
            return jnp.take(t, i, axis=0)

        dt = _time_call(xla_gather, idx, table)
        ns_row = dt / n * 1e9
        print(f"[feat={feat}] XLA take(): {dt*1e3:.2f} ms = {ns_row:.2f} ns/row", flush=True)
        results[f"xla_f{feat}"] = ns_row

        for depth in (1, 4, 8, 16):
            try:
                fn = make_dma_gather(n, feat, block=512, depth=depth)
                dt = _time_call(fn, idx, table)
                ns_row = dt / n * 1e9
                print(
                    f"[feat={feat}] DMA gather depth={depth}: {dt*1e3:.2f} ms = "
                    f"{ns_row:.2f} ns/row", flush=True,
                )
                results[f"dma_f{feat}_d{depth}"] = ns_row
            except Exception as e:  # noqa: BLE001 - probe records failures
                print(f"[feat={feat}] DMA depth={depth} FAILED: {type(e).__name__}: {e}", flush=True)

        for chunk in (1, 8, 64):
            try:
                fn = make_dma_gather_chunked(n, feat, block=512, chunk=chunk)
                dt = _time_call(fn, idx, table)
                ns_row = dt / n * 1e9
                print(
                    f"[feat={feat}] DMA contiguous chunk={chunk}: {dt*1e3:.2f} ms = "
                    f"{ns_row:.2f} ns/row", flush=True,
                )
                results[f"dma_chunk_f{feat}_c{chunk}"] = ns_row
            except Exception as e:  # noqa: BLE001
                print(f"[feat={feat}] chunk={chunk} FAILED: {type(e).__name__}: {e}", flush=True)

    # Correctness spot-check on the best-effort variant
    feat = 8
    table = jnp.asarray(rng.normal(size=(table_rows, feat)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, table_rows, size=(4096,)).astype(np.int32))
    try:
        fn = make_dma_gather(4096, feat, block=512, depth=8)
        got = np.asarray(fn(idx, table))
        want = np.asarray(table)[np.asarray(idx)]
        print("correctness max|diff|:", float(np.max(np.abs(got - want))), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"correctness check FAILED: {type(e).__name__}: {e}", flush=True)

    print(results)


if __name__ == "__main__":
    main()
