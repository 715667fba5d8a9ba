"""Rank-merge (comparison-count + shift network) vs the bitonic merge,
through the fused march kernels in Pallas interpret mode on CPU.

Both merges realize the same stable sorted merge of [old | new-descending]
buffers, so the refined z buffers — and everything downstream — must agree
to f32 exactness (ties have measure zero on this data)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode twin tests are CPU-only",
)

from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init
from nrhints_tpu.kernels.march import fused_importance_z, fused_shadow_tau


@pytest.fixture(scope="module")
def setup():
    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b = 24
    o = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32)) * 0.1
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z0 = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 64), (b, 64))
    sdist = jnp.full((b, 1), 2.0 / 64)
    return cfg, params, o, d, z0, sdist


def test_importance_rank_merge_matches_bitonic(setup):
    cfg, params, o, d, z0, _ = setup
    z_bit = fused_importance_z(params, cfg, o, d, z0, block_rays=8, interpret=True)
    z_rank = fused_importance_z(
        params, cfg, o, d, z0, block_rays=8, interpret=True, merge="rank"
    )
    np.testing.assert_allclose(np.asarray(z_rank), np.asarray(z_bit), atol=1e-6)
    # the merged buffer must be sorted ascending
    zr = np.asarray(z_rank)
    assert (np.diff(zr, axis=-1) >= -1e-6).all()


def test_shadow_rank_merge_matches_bitonic(setup):
    cfg, params, o, d, z0, sdist = setup
    args = (params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(0.7))
    tau_bit = fused_shadow_tau(*args, block_rays=8, interpret=True)
    tau_rank = fused_shadow_tau(*args, block_rays=8, interpret=True, merge="rank")
    np.testing.assert_allclose(np.asarray(tau_rank), np.asarray(tau_bit), atol=1e-6)


def test_shadow_split_rank_merge(setup):
    cfg, params, o, d, z0, sdist = setup
    args = (params, cfg, o, d, z0, sdist, jnp.asarray(64.0), jnp.asarray(1.0))
    tau_bit = fused_shadow_tau(
        *args, block_rays=8, interpret=True, split=True, refine_block_rays=8
    )
    tau_rank = fused_shadow_tau(
        *args, block_rays=8, interpret=True, split=True, refine_block_rays=8,
        merge="rank",
    )
    np.testing.assert_allclose(np.asarray(tau_rank), np.asarray(tau_bit), atol=1e-6)


def test_split_importance_matches_monolith(setup):
    """The split importance march (sweep kernel + rounds kernel) is
    numerically identical to the monolith (measured perf-neutral on the
    chip — PROFILE.md 'Where the march time actually goes')."""
    cfg, params, o, d, z0, _ = setup
    z_mono = fused_importance_z(params, cfg, o, d, z0, block_rays=8, interpret=True)
    z_split = fused_importance_z(
        params, cfg, o, d, z0, block_rays=8, interpret=True,
        split=True, sweep_block_rays=16,
    )
    np.testing.assert_array_equal(np.asarray(z_split), np.asarray(z_mono))
