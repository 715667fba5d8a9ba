import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.fields.bg_nerf import BgNeRFConfig, bg_nerf_forward, bg_nerf_init
from nrhints_tpu.fields.mlp import (
    weight_norm_apply,
    weight_norm_effective_weight,
    weight_norm_params,
)
from nrhints_tpu.fields.reflectance import (
    ReflectanceNetConfig,
    reflectance_forward,
    reflectance_init,
    reflectance_input_dim,
)
from nrhints_tpu.fields.sdf import (
    SDFNetConfig,
    sdf_forward,
    sdf_init,
    sdf_only,
    sdf_value_feat_grad,
)
from nrhints_tpu.fields.variance import VarianceConfig, inv_s_from_params, variance_init


def test_weight_norm_preserves_initial_weight():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    p = weight_norm_params(jnp.asarray(w), jnp.asarray(b))
    x = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(weight_norm_apply(p, x)), np.asarray(x) @ w + b, rtol=2e-5, atol=1e-5
    )
    we, be = weight_norm_effective_weight(p)
    np.testing.assert_allclose(np.asarray(we), w, rtol=2e-5, atol=1e-6)


def test_sdf_geometric_init_approximates_sphere():
    """SAL init: sdf(x) ~ |x| - init_bias for points around the sphere."""
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    dirs = rng.standard_normal((256, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = rng.uniform(0.2, 1.0, (256, 1))
    pts = jnp.asarray((dirs * radii).astype(np.float32))
    sdf = np.asarray(sdf_only(params, cfg, pts))
    expected = radii[:, 0] - cfg.init_bias
    # The init is approximate; check correlation and small error.  (The
    # torch reference's own init scores ~0.085 mean-abs-err / 0.91 corr on
    # this same probe, so these bounds hold it to reference quality.)
    assert np.abs(sdf - expected).mean() < 0.1
    assert np.corrcoef(sdf, expected)[0, 1] > 0.9


def test_sdf_gradient_is_unit_near_init():
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.default_rng(2).uniform(-0.8, 0.8, (64, 3)).astype(np.float32))
    sdf, feat, grad = sdf_value_feat_grad(params, cfg, pts)
    assert sdf.shape == (64,)
    assert feat.shape == (64, 256)
    assert grad.shape == (64, 3)
    norms = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.abs(norms - 1.0).mean() < 0.2


def test_sdf_grad_matches_finite_difference():
    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=8)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    x = jnp.array([[0.3, -0.2, 0.4]])
    _, _, grad = sdf_value_feat_grad(params, cfg, x)
    eps = 1e-3
    fd = []
    for i in range(3):
        dx = jnp.zeros((1, 3)).at[0, i].set(eps)
        f1 = sdf_only(params, cfg, x + dx)[0]
        f0 = sdf_only(params, cfg, x - dx)[0]
        fd.append((f1 - f0) / (2 * eps))
    np.testing.assert_allclose(np.asarray(grad)[0], np.asarray(fd), atol=1e-2)


def test_sdf_double_backward_works():
    """Eikonal-style loss: grad of (|grad sdf| - 1)^2 wrt params must exist."""
    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=8)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.default_rng(3).uniform(-0.5, 0.5, (16, 3)).astype(np.float32))

    def loss(p):
        _, _, g = sdf_value_feat_grad(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_sdf_forward_output_layout():
    cfg = SDFNetConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    out = sdf_forward(params, cfg, jnp.zeros((4, 3)))
    assert out.shape == (4, 257)


def test_reflectance_shapes_and_range():
    cfg = ReflectanceNetConfig()
    params = reflectance_init(jax.random.PRNGKey(0), cfg)
    n = 32
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    rgb = reflectance_forward(
        params, cfg, r(n, 3), r(n, 3), r(n, 3), r(n, 256), r(n, 3), r(n, 1), r(n, 4)
    )
    assert rgb.shape == (n, 3)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


def test_reflectance_input_dim_matches_reference_bookkeeping():
    cfg = ReflectanceNetConfig()
    # Reference: d_in=12(+1 shadow)(+4 spec) + d_feature 256 + PE extras.
    assert reflectance_input_dim(cfg, 256, True, True, 4) == 17 + 256 + 48 + 8 + 32
    assert reflectance_input_dim(cfg, 256, False, False, 4) == 12 + 256 + 48


def test_reflectance_without_hints():
    cfg = ReflectanceNetConfig()
    params = reflectance_init(
        jax.random.PRNGKey(0), cfg, shadow_hint=False, specular_hint=False
    )
    n = 8
    z = jnp.zeros((n, 3))
    rgb = reflectance_forward(params, cfg, z, z, z, jnp.zeros((n, 256)), z)
    assert rgb.shape == (n, 3)


def test_variance_network():
    p = variance_init(VarianceConfig(init_val=0.3))
    np.testing.assert_allclose(float(inv_s_from_params(p)), np.exp(3.0), rtol=1e-5)


def test_bg_nerf_shapes():
    cfg = BgNeRFConfig(n_layers=4, d_hidden=64)
    params = bg_nerf_init(jax.random.PRNGKey(0), cfg)
    n = 16
    alpha, rgb = bg_nerf_forward(
        params, cfg, jnp.zeros((n, 4)), jnp.zeros((n, 3)), jnp.zeros((n, 3))
    )
    assert alpha.shape == (n, 1)
    assert rgb.shape == (n, 3)


def test_sdf_hash_encoding_variant():
    """Hash-encoded SDF: forward, normals, and eikonal double-backward."""
    cfg = SDFNetConfig(
        n_layers=2, d_hidden=64, d_out_feat=16, encoding="hash",
        hash_levels=4, hash_min_res=4, hash_max_res=32, hash_log2_size=10,
    )
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    assert "hash" in params
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.8, 0.8, (32, 3)).astype(np.float32)
    )
    out = sdf_forward(params, cfg, pts)
    assert out.shape == (32, 17)
    sdf, feat, grad = sdf_value_feat_grad(params, cfg, pts)
    assert np.isfinite(np.asarray(grad)).all()

    def loss(p):
        _, _, g = sdf_value_feat_grad(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(grads["hash"]["table"])).all()
    assert np.abs(np.asarray(grads["lin0"]["v"])).max() > 0


def test_sdf_weight_norm_off():
    """weight_norm=False must build a PLAIN parameterization (w/b leaves,
    no v/g) and still run forward + kernels' weight materialization —
    the reference wraps in nn.utils.weight_norm only when configured."""
    from nrhints_tpu.fields.mlp import effective_weight

    cfg = SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16, weight_norm=False)
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    assert set(params["lin0"]) == {"w", "b"}
    out = sdf_forward(params, cfg, jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(out)).all()
    w, b = effective_weight(params["lin0"])
    np.testing.assert_array_equal(np.asarray(w), np.asarray(params["lin0"]["w"]))


def test_sdf_plain_init_matches_torch_defaults():
    """geometric_init=False uses torch.nn.Linear default init stats (the
    reference applies the SAL sphere init only under geometric_init)."""
    cfg = SDFNetConfig(geometric_init=False)
    params = sdf_init(jax.random.PRNGKey(1), cfg)
    v = np.asarray(params["lin0"]["v"])
    in_dim = v.shape[0]
    bound = 1.0 / np.sqrt(in_dim)
    assert np.abs(v).max() <= bound + 1e-6
    # Heads too: no sqrt(pi) constant, no -init_bias bias.
    head_b = np.asarray(params["out_sdf"]["b"])
    assert np.abs(head_b).max() <= 1.0 / np.sqrt(256) + 1e-6
