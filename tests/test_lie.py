import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from nrhints_tpu.core.lie import exp_map_SE3, exp_map_SO3xR3


def test_so3xr3_matches_scipy_rotation():
    rng = np.random.default_rng(0)
    tangent = rng.standard_normal((16, 6)).astype(np.float32) * 0.5
    out = np.asarray(exp_map_SO3xR3(jnp.asarray(tangent)))
    R_expected = Rotation.from_rotvec(tangent[:, 3:]).as_matrix()
    np.testing.assert_allclose(out[:, :3, :3], R_expected, atol=2e-5)
    # Translation passes through unrotated for the direct product group.
    np.testing.assert_allclose(out[:, :3, 3], tangent[:, :3], atol=1e-6)


def test_se3_matches_scipy_for_rotation_part():
    rng = np.random.default_rng(1)
    tangent = rng.standard_normal((16, 6)).astype(np.float32) * 0.7
    out = np.asarray(exp_map_SE3(jnp.asarray(tangent)))
    R_expected = Rotation.from_rotvec(tangent[:, 3:]).as_matrix()
    np.testing.assert_allclose(out[:, :3, :3], R_expected, atol=2e-5)


def test_se3_translation_closed_form():
    """t = V @ lin with V = I + (1-cos)/th^2 K + (th-sin)/th^3 K^2."""
    rng = np.random.default_rng(2)
    tangent = rng.standard_normal((8, 6)).astype(np.float64)
    out = np.asarray(exp_map_SE3(jnp.asarray(tangent, dtype=jnp.float32)))
    for i in range(8):
        lin, ang = tangent[i, :3], tangent[i, 3:]
        th = np.linalg.norm(ang)
        K = np.array(
            [[0, -ang[2], ang[1]], [ang[2], 0, -ang[0]], [-ang[1], ang[0], 0]]
        )
        V = (
            np.eye(3)
            + (1 - np.cos(th)) / th ** 2 * K
            + (th - np.sin(th)) / th ** 3 * (K @ K)
        )
        np.testing.assert_allclose(out[i, :3, 3], V @ lin, atol=1e-4)


def test_se3_near_zero_is_identity_plus_translation():
    tangent = jnp.zeros((3, 6)).at[:, :3].set(jnp.array([[1.0, 2.0, 3.0]] * 3))
    out = np.asarray(exp_map_SE3(tangent))
    np.testing.assert_allclose(out[:, :3, :3], np.eye(3)[None].repeat(3, 0), atol=1e-5)
    np.testing.assert_allclose(out[:, :3, 3], [[1, 2, 3]] * 3, atol=1e-5)


def test_so3xr3_zero_tangent_is_identity():
    out = np.asarray(exp_map_SO3xR3(jnp.zeros((2, 6))))
    np.testing.assert_allclose(out[:, :3, :3], np.eye(3)[None].repeat(2, 0), atol=1e-6)
    np.testing.assert_allclose(out[:, :3, 3], 0.0, atol=1e-6)


def test_exp_map_gradients_finite_at_zero():
    """Zero tangent (the pose table's init) must have FINITE gradients:
    sqrt's infinite derivative at 0 leaks NaN through jnp.where unless the
    double-where guard recomputes theta from a clamped theta2 — with NaN
    here, SE3 pose optimization is poisoned from the first step."""
    z = jnp.zeros((3, 6))
    for fn in (exp_map_SE3, exp_map_SO3xR3):
        g = jax.grad(lambda t: jnp.sum(fn(t)))(z)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__
