"""Shared building blocks for the fused Pallas renderers.

Only what BOTH kernel modules use lives here; the lane-axis tricks
(bitonic merges, triangular-matmul prefix scans, one-hot gathers) are
private to ``march.py`` — they are Mosaic-sensitive (negative roll shifts,
i1-vector selects, and float iota all fail to compile; see CLAUDE.md) and
each kernel carries the exact formulation it was validated with.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from nrhints_tpu.fields.mlp import effective_weight
from nrhints_tpu.fields.sdf import SDFNetConfig

INV_SQRT2 = 1.0 / math.sqrt(2.0)


def materialize_sdf_weights(params: dict, cfg: SDFNetConfig) -> tuple:
    """Weight-norm SDF params -> flat tuple of effective dense (w, b) pairs:
    (w0, b0, ..., w7, b7, w_sdf, b_sdf).  Computed once per step outside the
    kernel so the normalization never runs per-point."""
    out = []
    for i in range(cfg.n_layers):
        w, b = effective_weight(params[f"lin{i}"])
        out += [w, b]
    w, b = effective_weight(params["out_sdf"])
    out += [w, b]
    return tuple(out)


def softplus100_gate(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(softplus(100 z) * 0.01, sigmoid(100 z)) from ONE exponential.

    The fused kernels are VPU-transcendental-bound, not MXU-bound: each MLP
    layer needs both the activation and its gate (softplus' = sigmoid), and
    evaluating them independently costs two exps.  Here ``e = exp(-|t|)``
    feeds both — softplus via the logaddexp form (the same stable
    formulation ``jax.nn.softplus`` uses) and sigmoid as ``1/(1+e)`` /
    ``e/(1+e)`` by sign.  Under ``jax.vjp`` the derivative of ``e`` is the
    rational ``-sign(t)*e``, so the backward kernel pays no additional
    transcendentals for the activation chain either."""
    t = 100.0 * z
    e = jnp.exp(-jnp.abs(t))
    inv = 1.0 / (1.0 + e)
    gate = jnp.where(t >= 0.0, inv, e * inv)
    sp = (jnp.maximum(t, 0.0) + jnp.log1p(e)) * 0.01
    return sp, gate
