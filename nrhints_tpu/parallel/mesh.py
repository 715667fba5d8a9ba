"""Device mesh and sharding helpers: ray/batch data parallelism over TPU.

This is the TPU-native replacement for the reference's whole distributed
stack (NCCL process group, DDP wrapper, subprocess launcher —
``trainer/launcher.py`` / ``trainer/ddp_helper.py`` / ``trainer/trainer.py:54-93``
in iamNCJ/NRHints).  One JAX process per host; a 1-D ``('data',)`` mesh over
all chips; the ray batch is sharded over 'data' and parameters are
replicated, so XLA emits the gradient psum fused into the backward pass —
there is no hand-written collective anywhere.
"""
from __future__ import annotations

import warnings
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (one process per host).

    Replaces the MASTER_ADDR/RANK env plumbing + NCCL rendezvous of the
    reference; on TPU pods the coordinator discovers peers itself (all
    arguments None).  Explicit arguments support CPU multi-process testing
    (tests/test_multihost.py) and manual clusters — the analog of the
    reference's ``MASTER_ADDR``/``RANK`` env vars (trainer/ddp_helper.py).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(data_axis_size: int = -1, devices=None, sample_axis_size: int = 1) -> Mesh:
    """1-D ``('data',)`` ray-DP mesh, or — with ``sample_axis_size > 1`` — a
    2-D ``('data', 'sample')`` mesh whose second axis shards the per-ray
    sample dimension of the shadow march (SURVEY.md §5.7's context-parallel
    analog).  The 2-D mesh targets the constant-global-batch pod regime
    (512 rays on >512 chips, the reference's semantics,
    ``trainer/trainer.py:118`` in iamNCJ/NRHints): when the ray count cannot
    cover the whole mesh, the march's MLP sweeps still can."""
    devices = list(jax.devices() if devices is None else devices)
    if sample_axis_size > 1:
        if data_axis_size == -1:
            data_axis_size = len(devices) // sample_axis_size
            dropped = len(devices) - data_axis_size * sample_axis_size
            if dropped:
                warnings.warn(
                    f"make_mesh: {len(devices)} devices do not divide by "
                    f"sample_axis_size={sample_axis_size}; building a "
                    f"{data_axis_size}x{sample_axis_size} mesh and leaving "
                    f"{dropped} device(s) idle",
                    stacklevel=2,
                )
        n = data_axis_size * sample_axis_size
        if n > len(devices) or data_axis_size < 1:
            raise ValueError(
                f"mesh {data_axis_size}x{sample_axis_size} > available devices "
                f"{len(devices)}"
            )
        return Mesh(
            np.asarray(devices[:n]).reshape(data_axis_size, sample_axis_size),
            ("data", "sample"),
        )
    if data_axis_size == -1:
        data_axis_size = len(devices)
    if data_axis_size > len(devices):
        raise ValueError(
            f"data_axis_size {data_axis_size} > available devices {len(devices)}"
        )
    return Mesh(np.asarray(devices[:data_axis_size]), ("data",))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Rays sharded along the batch axis (leading by default; axis 1 for
    stacked multi-step batches [n_steps, rays, ...])."""
    return NamedSharding(mesh, P(*([None] * batch_axis), "data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch, batch_axis: int = 0):
    """Host pytree -> device arrays with leading-axis sharding over 'data'.

    Single-host: a plain (sharded) device_put.  Multi-host: each host holds
    only its local slice of the global batch (the sampler's rank-seed
    discipline guarantees disjoint draws), and the global array is assembled
    with make_array_from_process_local_data — the JAX-native replacement for
    the reference's per-rank shm reads (SURVEY.md §5.8)."""
    if mesh is None:
        return jax.device_put(batch)
    sh = batch_sharding(mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch
    )


def replicate(mesh: Optional[Mesh], tree):
    if mesh is None:
        return jax.device_put(tree)
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_rays_call(fn, mesh: Optional[Mesh], in_specs, out_specs):
    """Wrap ``fn`` in ``jax.shard_map`` over the 'data' axis — the manual
    escape hatch that makes Pallas custom calls partition.

    XLA's SPMD partitioner has no sharding rule for Mosaic custom calls: a
    ``pallas_call`` embedded in a GSPMD-partitioned program silently gathers
    its operands onto one device (measured in round 2 — kernel outputs came
    back unsharded under an 8-way sharded batch).  ``shard_map`` runs the
    kernel per-shard instead: each device sees only its local ray block, so
    the kernels scale over the mesh exactly like the reference's DDP
    replicas scale its marches (``trainer/trainer.py:88-93,118``).

    ``check_vma=False``: the fused core ops are ``jax.custom_vjp`` whose bwd
    returns unreduced weight cotangents; with vma checking off, shard_map's
    transpose inserts the psum for replicated-in (P()) arguments itself —
    verified grad-exact vs the unsharded path in tests/test_shard_fused.py.

    Returns ``fn`` unchanged when the mesh is absent or single-device (the
    single-chip program stays byte-identical to the unwrapped one).
    """
    if mesh is None or mesh.size <= 1:
        return fn
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
