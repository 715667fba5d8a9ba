"""Fused with-grad core MLP ops (kernels/core_mlp.py) vs their jnp twins,
in Pallas interpret mode on the CPU mesh — values, input grads, and the
second-order parameter grads the eikonal loss depends on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# These are CPU-only interpret-mode comparisons at f32 tolerances; under
# NRHINTS_TPU_TESTS=1 the default backend is the real TPU, whose DEFAULT
# precision rounds f32 dot operands to bf16 — the twins then differ at
# ~1e-3 by design, not by bug.  The on-hardware kernel checks live in
# tests/test_kernels.py.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="interpret-mode f32 twin tests are CPU-only",
)

from nrhints_tpu.fields.reflectance import (
    ReflectanceNetConfig,
    reflectance_forward,
    reflectance_init,
)
from nrhints_tpu.fields.sdf import SDFNetConfig, sdf_init, sdf_value_feat_grad
from nrhints_tpu.kernels.core_mlp import (
    fused_reflectance_forward,
    fused_sdf_value_feat_grad,
    mlp_relu_ref,
    sdf_core_ref,
)

# Small widths keep interpret mode fast; skip layer + dual heads exercised.
SCFG = SDFNetConfig(n_layers=4, d_hidden=64, d_out_feat=32, skip_in=(2,), multi_res=4)
CCFG = ReflectanceNetConfig(n_layers=2, d_hidden=48)


@pytest.fixture(scope="module")
def sdf_setup():
    params = sdf_init(jax.random.PRNGKey(0), SCFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32)) * 0.4
    return params, x


def test_fused_sdf_core_values(sdf_setup):
    params, x = sdf_setup
    s0, f0, g0 = sdf_value_feat_grad(params, SCFG, x)
    s1, f1, g1 = fused_sdf_value_feat_grad(params, SCFG, x, block_pts=32, interpret=True, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)


def test_fused_sdf_core_second_order_grads(sdf_setup):
    """d(loss incl eikonal)/d(params, x) through the custom VJP matches
    plain nested AD through the jnp path."""
    params, x = sdf_setup

    def loss(fn):
        def inner(p, xx):
            s, f, g = fn(p, xx)
            eik = jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            return jnp.sum(s * 1.3) + jnp.sum(f**2) * 1e-3 + eik

        return inner

    jnp_fn = loss(lambda p, xx: sdf_value_feat_grad(p, SCFG, xx))
    fused_fn = loss(
        lambda p, xx: fused_sdf_value_feat_grad(p, SCFG, xx, block_pts=32, interpret=True, compute_dtype="float32")
    )
    gp0, gx0 = jax.grad(jnp_fn, argnums=(0, 1))(params, x)
    gp1, gx1 = jax.grad(fused_fn, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=1e-4)
    for l0, l1 in zip(jax.tree_util.tree_leaves(gp0), jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=5e-4)


def test_fused_sdf_core_padding():
    """Point counts that don't divide the block size pad correctly."""
    params = sdf_init(jax.random.PRNGKey(3), SCFG)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(45, 3)).astype(np.float32)) * 0.4
    s0, f0, g0 = sdf_value_feat_grad(params, SCFG, x)
    s1, f1, g1 = fused_sdf_value_feat_grad(params, SCFG, x, block_pts=32, interpret=True, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)

    # dW accumulation must ignore the padded rows.
    def loss(fn):
        return lambda p: jnp.sum(fn(p)[0])

    gp0 = jax.grad(loss(lambda p: sdf_value_feat_grad(p, SCFG, x)))(params)
    gp1 = jax.grad(
        loss(lambda p: fused_sdf_value_feat_grad(p, SCFG, x, block_pts=32, interpret=True, compute_dtype="float32"))
    )(params)
    for l0, l1 in zip(jax.tree_util.tree_leaves(gp0), jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


@pytest.fixture(scope="module")
def color_setup():
    params = reflectance_init(jax.random.PRNGKey(1), CCFG, d_feature=32)
    rng = np.random.default_rng(2)
    N = 70
    mk = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return params, mk(N, 3), mk(N, 3), mk(N, 3), mk(N, 32), mk(N, 3), jnp.abs(mk(N, 1)), jnp.abs(mk(N, 4))


def test_fused_reflectance_values_and_grads(color_setup):
    params, x, nrm, v, feat, pl_, vis, spec = color_setup
    y0 = reflectance_forward(params, CCFG, x, nrm, v, feat, pl_, vis, spec)
    y1 = fused_reflectance_forward(
        params, CCFG, x, nrm, v, feat, pl_, vis, spec, block_pts=32,
        interpret=True, compute_dtype="float32"
    )
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(fn):
        return lambda p, ff: jnp.sum(fn(p, ff) ** 2)

    j = loss(lambda p, ff: reflectance_forward(p, CCFG, x, nrm, v, ff, pl_, vis, spec))
    k = loss(
        lambda p, ff: fused_reflectance_forward(
            p, CCFG, x, nrm, v, ff, pl_, vis, spec, block_pts=32,
            interpret=True, compute_dtype="float32"
        )
    )
    gp0, gf0 = jax.grad(j, argnums=(0, 1))(params, feat)
    gp1, gf1 = jax.grad(k, argnums=(0, 1))(params, feat)
    np.testing.assert_allclose(np.asarray(gf0), np.asarray(gf1), atol=1e-5)
    for l0, l1 in zip(jax.tree_util.tree_leaves(gp0), jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


def test_refs_match_field_forward():
    """The in-kernel jnp programs themselves match the field modules exactly
    (same math, no pallas involved)."""
    from nrhints_tpu.kernels.core_mlp import materialize_mlp_weights, materialize_sdf_weights_full

    params = sdf_init(jax.random.PRNGKey(5), SCFG)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)) * 0.3
    ws = materialize_sdf_weights_full(params, SCFG)
    s, f, g = sdf_core_ref(ws, x, SCFG)
    s0, f0, g0 = sdf_value_feat_grad(params, SCFG, x)
    np.testing.assert_allclose(np.asarray(s[:, 0]), np.asarray(s0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0), atol=1e-6)
