import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrhints_tpu.core.encodings import (
    HashEncodingConfig,
    hash_encoding_apply,
    hash_encoding_init,
    nerf_encoding,
    nerf_encoding_dim,
    rff_encoding_apply,
    rff_encoding_init,
    spherical_harmonics_encoding,
)


def test_nerf_encoding_layout_matches_manual_numpy():
    """Layout: [x, sin(dim-major scaled), cos(same order)] with freqs 2^linspace."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 3)).astype(np.float32)
    L = 4
    freqs = 2.0 ** np.linspace(0.0, L - 1, L)
    scaled = (x[..., None] * freqs).reshape(5, 3 * L)
    expected = np.concatenate(
        [x, np.sin(scaled), np.sin(scaled + np.pi / 2.0)], axis=-1
    )
    got = np.asarray(nerf_encoding(jnp.asarray(x), L, include_input=True))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_nerf_encoding_dims():
    assert nerf_encoding_dim(3, 6, True) == 39
    assert nerf_encoding_dim(3, 4, True) == 27
    assert nerf_encoding_dim(1, 4, True) == 9
    assert nerf_encoding_dim(4, 4, True) == 36
    x = jnp.ones((7, 3))
    assert nerf_encoding(x, 6).shape == (7, 39)
    assert nerf_encoding(x, 6, include_input=False).shape == (7, 36)


def test_nerf_encoding_no_input():
    x = jnp.linspace(-1, 1, 6).reshape(2, 3)
    enc = nerf_encoding(x, 2, include_input=False)
    assert enc.shape == (2, 12)
    # First half is sines, second half cosines of the same phases.
    np.testing.assert_allclose(
        np.asarray(enc[:, 6:]) ** 2 + np.asarray(enc[:, :6]) ** 2,
        np.ones((2, 6)),
        atol=1e-5,
    )


def test_hash_encoding_shapes_and_determinism():
    cfg = HashEncodingConfig(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=10)
    params = hash_encoding_init(jax.random.PRNGKey(0), cfg)
    assert params["table"].shape == (4, 1024, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    out = hash_encoding_apply(params, x, cfg)
    assert out.shape == (17, cfg.out_dim)
    out2 = hash_encoding_apply(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_hash_encoding_trilinear_continuity():
    """Output should vary continuously with the query point."""
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    params = hash_encoding_init(jax.random.PRNGKey(0), cfg)
    x0 = jnp.array([[0.3, 0.4, 0.5]])
    eps = 1e-4
    x1 = x0 + eps
    d = np.abs(
        np.asarray(hash_encoding_apply(params, x0, cfg))
        - np.asarray(hash_encoding_apply(params, x1, cfg))
    )
    assert d.max() < 1e-3


def test_hash_encoding_differentiable():
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    params = hash_encoding_init(jax.random.PRNGKey(0), cfg)
    x = jnp.array([[0.3, 0.4, 0.5]])
    g = jax.grad(lambda p: jnp.sum(hash_encoding_apply(p, x, cfg)))(params)
    assert np.isfinite(np.asarray(g["table"])).all()


@pytest.mark.parametrize("levels,n", [(1, 1), (2, 4), (3, 9), (4, 16)])
def test_spherical_harmonics_count(levels, n):
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = spherical_harmonics_encoding(d, levels)
    assert out.shape == (2, n)
    # l=0 term is the constant 1/(2 sqrt(pi)).
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.28209479, rtol=1e-5)


def test_rff_encoding():
    params = rff_encoding_init(jax.random.PRNGKey(0), 3, 8, scale=2.0)
    x = jnp.ones((5, 3))
    out = rff_encoding_apply(params, x, include_input=True)
    assert out.shape == (5, 3 + 16)
