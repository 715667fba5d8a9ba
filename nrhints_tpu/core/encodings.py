"""Positional encodings as pure functions (plus a hash-grid encoding).

Reference capability surface: ``fields/encodings.py`` in iamNCJ/NRHints
(NeRFEncoding is the live path at L=6/4/10; HashEncoding is the optional
Instant-NGP-style fast path).  Here encodings are stateless pure functions of
``(x,)`` or ``(params, x)`` so they inline into the jitted render function and
fuse with the downstream matmuls.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def nerf_encoding_dim(in_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    out = in_dim * num_frequencies * 2
    if include_input:
        out += in_dim
    return out


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: float | None = None,
    include_input: bool = True,
) -> jnp.ndarray:
    """Multi-scale sinusoidal encoding.

    Output layout matches the reference (``fields/encodings.py:155-176``):
    ``[x, sin(x*f0),...,sin(x*fk) per-dim-major, cos(...) same order]`` where
    the cosines are realized as ``sin(z + pi/2)``.
    """
    if max_freq_exp is None:
        max_freq_exp = num_frequencies - 1
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    freqs = freqs.astype(x.dtype)
    scaled = x[..., None] * freqs  # [..., d, F]
    scaled = scaled.reshape(*x.shape[:-1], x.shape[-1] * num_frequencies)
    enc = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


class HashEncodingConfig(NamedTuple):
    """Instant-NGP-style multiresolution hash grid (optional encoding).

    TPU-native design: one fused gather + trilinear interpolation over a
    ``[levels, table_size, features]`` table, vectorized over levels (no
    per-level python loop on the hot path).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    init_scale: float = 0.001
    log2_hashmap_size: int = 19
    features_per_level: int = 2

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level


# Primes from the Instant-NGP spatial hash (same constants as the reference
# fields/encodings.py:318).
_HASH_PRIMES = (1, 2654435761, 805459861)


def hash_encoding_init(key: jax.Array, cfg: HashEncodingConfig) -> dict:
    table = (
        jax.random.uniform(
            key,
            (cfg.num_levels, 2 ** cfg.log2_hashmap_size, cfg.features_per_level),
            minval=-cfg.init_scale,  # reference hash_init_scale default
            maxval=cfg.init_scale,   # (fields/encodings.py:258,274-275)
            dtype=jnp.float32,
        )
    )
    return {"table": table}


@functools.partial(jax.jit, static_argnums=(2,))
def hash_encoding_apply(params: dict, x: jnp.ndarray, cfg: HashEncodingConfig) -> jnp.ndarray:
    """Evaluate the hash encoding at points ``x`` in [0, 1]^3 -> [N, L*F].

    Vectorized across levels: scalings are a [L] vector; corner hashing and
    the 8-corner trilerp are batched as [N, L, 8, F] tensor ops that XLA maps
    onto the VPU; the only gather is the table lookup itself.
    """
    table = params["table"]
    L = cfg.num_levels
    growth = (
        math.exp((math.log(cfg.max_res) - math.log(cfg.min_res)) / (L - 1))
        if L > 1
        else 1.0
    )
    scalings = jnp.floor(cfg.min_res * growth ** jnp.arange(L))  # [L]
    xs = x[..., None, :] * scalings[:, None]  # [N, L, 3]
    xf = jnp.floor(xs)
    w = xs - xf  # [N, L, 3]
    ci = xf.astype(jnp.int32)  # [N, L, 3]

    # 8 corner offsets [8, 3]
    offsets = jnp.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
    )
    corners = ci[..., None, :] + offsets  # [N, L, 8, 3]
    primes = jnp.array(_HASH_PRIMES, dtype=jnp.uint32)
    h = corners.astype(jnp.uint32) * primes
    h = h[..., 0] ^ h[..., 1] ^ h[..., 2]  # [N, L, 8]
    h = (h % jnp.uint32(2 ** cfg.log2_hashmap_size)).astype(jnp.int32)

    # Flat-index row gather: XLA:TPU lowers a 1-D row gather from a flat
    # [L*T, F] table at HBM speed (~2.5 ms for 8.4M rows), while the
    # equivalent batched advanced-indexing gather with [N, L, 8]-shaped
    # broadcast index arrays lowers ~30x slower (81 ms measured on v5e —
    # outputs/r2 probes, PROFILE.md "hash encoding rebuild").
    T = jnp.int32(2 ** cfg.log2_hashmap_size)
    flat_idx = (h + jnp.arange(L, dtype=jnp.int32)[:, None] * T).reshape(-1)
    vals = jnp.take(
        table.reshape(L * (2 ** cfg.log2_hashmap_size), cfg.features_per_level),
        flat_idx,
        axis=0,
    ).reshape(*h.shape, cfg.features_per_level)  # [N, L, 8, F]

    # Trilinear interp weights per corner.
    cw = jnp.where(offsets == 1, w[..., None, :], 1.0 - w[..., None, :])
    # ^ broadcasting: offsets [8,3] vs w [N,L,1,3] -> [N,L,8,3]
    cw = jnp.prod(cw, axis=-1, keepdims=True)  # [N, L, 8, 1]
    out = jnp.sum(vals * cw, axis=-2)  # [N, L, F]
    return out.reshape(*x.shape[:-1], cfg.out_dim)


def spherical_harmonics_encoding(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit ``directions`` up to ``levels`` (<=4).

    Component-exact with the reference SHEncoding
    (``fields/encodings.py:374-430``), which uses nerfstudio's all-positive
    coefficient convention (NOT Condon-Shortley-signed real SH).
    """
    if not 1 <= levels <= 4:
        raise ValueError("levels must be in [1, 4]")
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def rff_encoding_init(key: jax.Array, in_dim: int, num_frequencies: int, scale: float) -> dict:
    """Random Fourier features: fixed Gaussian frequency matrix (reference RFFEncoding)."""
    b = jax.random.normal(key, (in_dim, num_frequencies)) * scale
    return {"b_matrix": b}


def rff_encoding_apply(params: dict, x: jnp.ndarray, include_input: bool = False) -> jnp.ndarray:
    """Layout matches the reference RFFEncoding.forward: [sin, cos] and,
    with include_input, the 2*pi-scaled input APPENDED after the encoding
    (``fields/encodings.py:220-232`` — not the raw input, not prepended)."""
    x2pi = 2.0 * jnp.pi * x
    scaled = x2pi @ params["b_matrix"]  # [..., F]
    enc = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
    if include_input:
        enc = jnp.concatenate([enc, x2pi], axis=-1)
    return enc
