"""Shared in-kernel building blocks for the fused Pallas renderers.

These functions run INSIDE pallas kernels (on jnp values backed by VMEM),
shaped for the TPU: samples in the 128-lane axis, points as rows feeding
the MXU, prefix products as log-cumsum matmuls, and sorted merges as
bitonic butterflies (rolls + selects) instead of scatters.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nrhints_tpu.fields.mlp import weight_norm_effective_weight
from nrhints_tpu.fields.sdf import SDFNetConfig

INV_SQRT2 = 1.0 / math.sqrt(2.0)


def materialize_sdf_weights(params: dict, cfg: SDFNetConfig) -> tuple:
    """Weight-norm SDF params -> flat tuple of effective dense (w, b) pairs:
    (w0, b0, ..., w7, b7, w_sdf, b_sdf).  Computed once per step outside the
    kernel so the normalization never runs per-point."""
    out = []
    for i in range(cfg.n_layers):
        w, b = weight_norm_effective_weight(params[f"lin{i}"])
        out += [w, b]
    w, b = weight_norm_effective_weight(params["out_sdf"])
    out += [w, b]
    return tuple(out)


def pe_encode(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[M, 3] -> [M, 3 + 3*F*2] frequency encoding, dim-major layout matching
    nerf_encoding (x, sin-block, cos-block).  Built with lane concats (no
    3-D reshapes, which Mosaic dislikes)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [F]
    parts = [x[:, d : d + 1] * freqs[None, :] for d in range(x.shape[1])]
    scaled = jnp.concatenate(parts, axis=-1)  # [M, 3F] dim-major
    return jnp.concatenate(
        [x, jnp.sin(scaled), jnp.sin(scaled + jnp.pi / 2.0)], axis=-1
    )


def pe_encode_with_tangent(x: jnp.ndarray, t: jnp.ndarray, num_freqs: int):
    """Frequency encoding of x plus its JVP along tangent t (both [M, 3])."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xs = [x[:, d : d + 1] * freqs[None, :] for d in range(x.shape[1])]
    ts = [t[:, d : d + 1] * freqs[None, :] for d in range(x.shape[1])]
    scaled = jnp.concatenate(xs, axis=-1)
    tscaled = jnp.concatenate(ts, axis=-1)
    sin_b = jnp.sin(scaled)
    cos_b = jnp.sin(scaled + jnp.pi / 2.0)
    enc = jnp.concatenate([x, sin_b, cos_b], axis=-1)
    # d/dx sin(fx) = f cos(fx);  d/dx cos(fx) = -f sin(fx)
    tenc = jnp.concatenate([t, tscaled * cos_b, -tscaled * sin_b], axis=-1)
    return enc, tenc


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(100.0 * x) * 0.01


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


def sdf_mlp(x: jnp.ndarray, weights: Sequence[jnp.ndarray], cfg: SDFNetConfig) -> jnp.ndarray:
    """[M, 3] raw points -> [M] sdf, using materialized weights."""
    xs = x * cfg.scale
    enc = pe_encode(xs, cfg.multi_res)
    h = enc
    for i in range(cfg.n_layers):
        if i in cfg.skip_in:
            h = jnp.concatenate([h, enc], axis=-1) * INV_SQRT2
        w, b = weights[2 * i], weights[2 * i + 1]
        h = _softplus100(
            jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
        )
    w, b = weights[-2], weights[-1]
    sdf = (jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]) / cfg.scale
    return sdf[:, 0]


def sdf_mlp_with_dirderiv(
    x: jnp.ndarray, dirs: jnp.ndarray, weights: Sequence[jnp.ndarray], cfg: SDFNetConfig
):
    """[M,3] points + [M,3] directions -> (sdf [M], dirs . grad sdf [M]).

    Hand-rolled forward-mode: one tangent stream propagated through the
    encoding and every layer (softplus' = sigmoid), exactly what the shadow
    march's cosine term needs."""
    xs = x * cfg.scale
    ts = dirs * cfg.scale
    enc, tenc = pe_encode_with_tangent(xs, ts, cfg.multi_res)
    h, th = enc, tenc
    for i in range(cfg.n_layers):
        if i in cfg.skip_in:
            h = jnp.concatenate([h, enc], axis=-1) * INV_SQRT2
            th = jnp.concatenate([th, tenc], axis=-1) * INV_SQRT2
        w, b = weights[2 * i], weights[2 * i + 1]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
        tz = jnp.dot(th, w, preferred_element_type=jnp.float32)
        h, gate = softplus100_gate(z)
        th = tz * gate
    w, b = weights[-2], weights[-1]
    sdf = (jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]) / cfg.scale
    dsdf = jnp.dot(th, w, preferred_element_type=jnp.float32) / cfg.scale
    return sdf[:, 0], dsdf[:, 0]


def cumsum_lanes(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Prefix sum along the last (lane) axis via a triangular-ones matmul —
    one MXU op instead of a sequential scan."""
    n = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (i < j if exclusive else i <= j).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def cumprod_lanes(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Prefix product along lanes as exp(cumsum(log x)); x must be > 0."""
    return jnp.exp(cumsum_lanes(jnp.log(x), exclusive=exclusive))


def bitonic_merge_128(z: jnp.ndarray, payload: jnp.ndarray | None = None):
    """Ascending merge of a bitonic [BR, 128] lane sequence (ascending head,
    +inf plateau, descending tail) via 7 butterfly stages.  ``payload``
    travels with z through the same compare-exchanges."""
    br, n = z.shape
    assert n == 128
    idx = jax.lax.broadcasted_iota(jnp.int32, (br, n), 1)
    for d in (64, 32, 16, 8, 4, 2, 1):
        hi = (idx & d) != 0  # position has bit d set -> partner is k - d
        p_lo = pltpu.roll(z, -d, axis=1)  # value at k + d (valid when !hi)
        p_hi = pltpu.roll(z, d, axis=1)  # value at k - d (valid when hi)
        p = jnp.where(hi, p_hi, p_lo)
        take_p = jnp.where(hi, p > z, p < z)
        if payload is not None:
            pay_lo = pltpu.roll(payload, -d, axis=1)
            pay_hi = pltpu.roll(payload, d, axis=1)
            p_pay = jnp.where(hi, pay_hi, pay_lo)
            payload = jnp.where(take_p, p_pay, payload)
        z = jnp.where(take_p, p, z)
    return z, payload


def onehot_gather_lanes(values: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """values [BR, N] gathered at inds [BR, K] -> [BR, K], via a one-hot
    mask + lane reduction (no dynamic gather, which Mosaic handles poorly).

    Implemented as sum over N of onehot * values broadcast: builds a
    [BR, K, N] intermediate — keep K*N modest (16 x 128 here)."""
    n = values.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (*inds.shape, n), inds.ndim)
    onehot = (lane == inds[..., None]).astype(values.dtype)
    return jnp.sum(onehot * values[:, None, :], axis=-1)
