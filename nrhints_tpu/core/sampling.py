"""Ray-sampling primitives: stratified samples, inverse-CDF importance
sampling, and NeuS SDF-guided up-sampling.

Reference behavior: ``models/neus_hint_model.py:21-65`` (sample_pdf),
``:269-315`` (up_sample), ``:317-331`` (cat_z_vals), ``:673-683`` (stratified
init) in iamNCJ/NRHints.  TPU-first notes: every shape here is static —
hierarchical sampling grows the z-buffer 64->80->96->112->128 through an
unrolled 4-round loop whose per-round shapes are compile-time constants, and
the sort-merge is ``argsort`` + ``take_along_axis`` (no dynamic shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    n_samples: int,
    *,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Uniform z in [near, far]; if ``key`` is given, jitter by one shared
    per-ray offset in [-0.5, 0.5] sample widths (reference ``:681-683``)."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=nears.dtype)
    z_vals = nears + (fars - nears) * t[None, :]  # [B, n]
    if key is not None:
        batch = z_vals.shape[0]
        t_rand = jax.random.uniform(key, (batch, 1), dtype=z_vals.dtype) - 0.5
        z_vals = z_vals + t_rand * 2.0 / n_samples
    return z_vals


def perturb_z_vals_within_bins(z_vals: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Independent stratified jitter inside each inter-sample interval
    (reference ``:388-395``, used for shadow rays and outside samples)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    *,
    det: bool = True,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` positions from a piecewise-
    constant pdf over ``bins`` (``[B, n_bins]`` edges, ``[B, n_bins-1]``
    weights).  ``det=True`` uses evenly spaced u (the NeuS default for
    up-sampling); otherwise uniform random u from ``key``."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, n_bins]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        assert key is not None, "non-deterministic sample_pdf needs a PRNG key"
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    # Vectorized right-searchsorted: count of cdf entries <= u.  The bin
    # count is small (<=129), so a [B, n_samples, n_bins] comparison tensor
    # is far cheaper on the TPU's VPU than a per-row binary search.
    inds = jnp.sum(u[..., :, None] >= cdf[..., None, :], axis=-1).astype(jnp.int32)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def neus_up_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    n_importance: int,
    inv_s: float,
) -> jnp.ndarray:
    """One round of NeuS hierarchical up-sampling at a fixed ``inv_s``.

    Converts section SDF values into alpha via the sigmoid-CDF ratio with the
    min(cos, prev_cos) robustness trick (reference ``:285-303`` and its ASCII
    diagram), then importance-samples ``n_importance`` new z positions from
    the resulting weights.  Pure function; callers wrap in stop_gradient.
    """
    batch_size, n_samples = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)
    sdf = sdf.reshape(batch_size, n_samples)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    prev_cos = jnp.concatenate(
        [jnp.zeros((batch_size, 1), dtype=cos_val.dtype), cos_val[:, :-1]], axis=-1
    )
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    weights = alpha * transmittance(alpha)
    return sample_pdf(z_vals, weights, n_importance, det=True)


def transmittance(alpha: jnp.ndarray) -> jnp.ndarray:
    """Accumulated transmittance T_i = prod_{j<i} (1 - a_j + 1e-7), exclusive.

    The 1e-7 epsilon matches the reference cumprod
    (``models/neus_hint_model.py:521-523``).
    """
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-7], axis=-1
    )
    return jnp.cumprod(shifted, axis=-1)


def merge_z_vals(
    z_vals: jnp.ndarray,
    new_z_vals: jnp.ndarray,
    sdf: jnp.ndarray | None = None,
    new_sdf: jnp.ndarray | None = None,
):
    """Sort-merge existing and newly sampled z positions (and their SDF
    values if given), with static output shapes.

    Reference ``cat_z_vals`` (``:317-331``); here the SDF evaluation at new
    points is the caller's job so this stays field-agnostic.
    """
    # Both inputs are already sorted (z_vals by construction, new_z_vals
    # because det inverse-CDF sampling is monotone), so instead of a bitonic
    # sort of the concatenation we compute merge ranks by counting — two
    # small comparison tensors and scatters, much cheaper on the VPU.  Tie
    # ranks match a stable sort of concat([z, new]): old before new.
    batch, n = z_vals.shape
    m = new_z_vals.shape[-1]
    r_old = jnp.arange(n) + jnp.sum(
        new_z_vals[:, None, :] < z_vals[:, :, None], axis=-1
    )
    r_new = jnp.arange(m) + jnp.sum(
        z_vals[:, None, :] <= new_z_vals[:, :, None], axis=-1
    )
    bidx = jnp.arange(batch)[:, None]
    z_sorted = (
        jnp.zeros((batch, n + m), z_vals.dtype)
        .at[bidx, r_old]
        .set(z_vals)
        .at[bidx, r_new]
        .set(new_z_vals)
    )
    if sdf is None:
        return z_sorted, None
    sdf_sorted = (
        jnp.zeros((batch, n + m), sdf.dtype)
        .at[bidx, r_old]
        .set(sdf)
        .at[bidx, r_new]
        .set(new_sdf)
    )
    return z_sorted, sdf_sorted
