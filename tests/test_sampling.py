import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.core.sampling import (
    merge_z_vals,
    neus_up_sample,
    perturb_z_vals_within_bins,
    sample_pdf,
    stratified_z_vals,
    transmittance,
)


def _numpy_sample_pdf_det(bins, weights, n_samples):
    """Independent numpy inverse-CDF reference (det=True path)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_samples), (*cdf.shape[:-1], n_samples))
    out = np.empty_like(u)
    for b in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[b], u[b], side="right")
        below = np.clip(inds - 1, 0, None)
        above = np.clip(inds, None, cdf.shape[-1] - 1)
        c0, c1 = cdf[b][below], cdf[b][above]
        b0, b1 = bins[b][below], bins[b][above]
        denom = np.where(c1 - c0 < 1e-5, 1.0, c1 - c0)
        t = (u[b] - c0) / denom
        out[b] = b0 + t * (b1 - b0)
    return out


def test_sample_pdf_matches_numpy_reference():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(0, 4, (6, 16)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, (6, 15)).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 8, det=True))
    expected = _numpy_sample_pdf_det(bins, weights, 8)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sample_pdf_random_in_range():
    bins = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = sample_pdf(bins, weights, 16, det=False, key=jax.random.PRNGKey(0))
    assert s.shape == (4, 16)
    assert (np.asarray(s) >= 1.0).all() and (np.asarray(s) <= 3.0).all()


def test_transmittance_matches_manual_cumprod():
    alpha = jnp.array([[0.1, 0.5, 0.9, 0.2]])
    got = np.asarray(transmittance(alpha))
    a = np.asarray(alpha)[0]
    expected = np.cumprod(np.concatenate([[1.0], 1 - a[:-1] + 1e-7]))
    np.testing.assert_allclose(got[0], expected, rtol=1e-6)


def test_stratified_z_vals_bounds_and_jitter():
    nears = jnp.full((5, 1), 2.0)
    fars = jnp.full((5, 1), 4.0)
    z = stratified_z_vals(nears, fars, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 4.0)
    zj = stratified_z_vals(nears, fars, 16, key=jax.random.PRNGKey(0))
    # One shared shift per ray, bounded by half a sample width.
    d = np.asarray(zj - z)
    assert (np.abs(d) <= 1.0 / 16 + 1e-6).all()
    np.testing.assert_allclose(d, d[:, :1].repeat(16, 1), atol=1e-6)


def test_perturb_within_bins_stays_sorted():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 32), (4, 32))
    zp = perturb_z_vals_within_bins(z, jax.random.PRNGKey(1))
    assert (np.diff(np.asarray(zp), axis=-1) >= 0).all()


def test_merge_z_vals_sorted_and_consistent():
    rng = np.random.default_rng(3)
    z = np.sort(rng.uniform(0, 1, (3, 8)).astype(np.float32), -1)
    # merge_z_vals requires BOTH inputs sorted (det inverse-CDF output is
    # monotone, so this always holds in the pipeline).
    new_z = np.sort(rng.uniform(0, 1, (3, 4)).astype(np.float32), -1)
    sdf = rng.standard_normal((3, 8)).astype(np.float32)
    new_sdf = rng.standard_normal((3, 4)).astype(np.float32)
    zm, sm = merge_z_vals(jnp.asarray(z), jnp.asarray(new_z), jnp.asarray(sdf), jnp.asarray(new_sdf))
    zm, sm = np.asarray(zm), np.asarray(sm)
    assert (np.diff(zm, axis=-1) >= 0).all()
    # Every (z, sdf) pair must survive the merge intact.
    for b in range(3):
        pairs = set(zip(np.concatenate([z[b], new_z[b]]).tolist(), np.concatenate([sdf[b], new_sdf[b]]).tolist()))
        merged = set(zip(zm[b].tolist(), sm[b].tolist()))
        assert pairs == merged


def test_neus_up_sample_places_samples_near_surface():
    """For a sphere SDF, importance samples should cluster near the z where
    the ray crosses the surface."""
    rays_o = jnp.array([[0.0, 0.0, -2.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    z = jnp.linspace(0.0, 4.0, 64)[None, :]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    sdf = jnp.linalg.norm(pts, axis=-1) - 0.5  # sphere radius 0.5
    new_z = neus_up_sample(rays_o, rays_d, z, sdf, 16, 64.0)
    # Surface crossing at z = 1.5 (entering).
    frac_near = (np.abs(np.asarray(new_z) - 1.5) < 0.3).mean()
    assert frac_near > 0.5
