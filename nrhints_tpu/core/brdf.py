"""Cook-Torrance specular terms used for the highlight (specular) hint.

Reference math: ``models/neus_hint_model.py:588-616`` in iamNCJ/NRHints —
GGX normal distribution, Schlick-GGX geometry with k=(r+1)^2/8, Schlick
Fresnel with F0=0.04, denominator 4*n.v + 1e-3, evaluated at a fixed set of
roughnesses.  Vectorized over the roughness list in one shot (the roughness
axis is a static [R] dimension, no python loop at trace time beyond a
broadcast).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis (torch F.normalize semantics:
    divides by max(||v||, eps))."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def cook_torrance_specular(
    normals: jnp.ndarray,  # [..., 3] unit shading normals
    lit_dirs: jnp.ndarray,  # [..., 3] unit, surface -> light
    view_dirs: jnp.ndarray,  # [..., 3] unit, surface -> eye
    roughnesses: Sequence[float],
) -> jnp.ndarray:
    """Cook-Torrance specular lobe per roughness -> [..., len(roughnesses)]."""
    half_vecs = normalize(lit_dirs + view_dirs)
    n_dot_l = jnp.clip(jnp.sum(normals * lit_dirs, axis=-1), 0.0, 1.0)
    n_dot_v = jnp.clip(jnp.sum(normals * view_dirs, axis=-1), 0.0, 1.0)
    n_dot_h = jnp.clip(jnp.sum(normals * half_vecs, axis=-1), 0.0, 1.0)
    h_dot_v = jnp.clip(jnp.sum(half_vecs * view_dirs, axis=-1), 0.0, 1.0)
    n_dot_h2 = n_dot_h ** 2

    r = jnp.asarray(roughnesses, dtype=normals.dtype)  # [R]
    # Broadcast dots to [..., R].
    ndl = n_dot_l[..., None]
    ndv = n_dot_v[..., None]
    ndh2 = n_dot_h2[..., None]
    hdv = h_dot_v[..., None]

    k = (r + 1.0) ** 2 / 8.0
    g1 = ndv / (ndv * (1.0 - k) + k)
    g2 = ndl / (ndl * (1.0 - k) + k)
    g = g1 * g2
    a2 = r * r
    ndf = a2 / (jnp.pi * (ndh2 * (a2 - 1.0) + 1.0) ** 2)
    f = 0.04 + 0.96 * (1.0 - hdv) ** 5
    return ndf * g * f / (4.0 * ndv + 1e-3)
