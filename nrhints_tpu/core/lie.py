"""Lie-group exponential maps for camera-pose optimization.

Same capability as the reference ``camera/lie_groups.py`` (tangent [b,6] ->
[R|t] [b,3,4] with Taylor-stable near-zero branches), written as branch-free
vectorized jnp (``jnp.where`` instead of in-place masked writes) so it traces
cleanly under jit/vmap and is differentiable everywhere.
"""
from __future__ import annotations

import jax.numpy as jnp


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """Exponential map of SO(3) x R^3: tangent [b,6] -> [b,3,4].

    Layout matches the reference (``camera/lie_groups.py:26-61``): first 3
    components translation, last 3 an so(3) tangent; translation is NOT
    rotated.  The angle is clamped at 1e-2 (squared-norm clamp 1e-4) for
    numerical stability, identical to the reference's behavior.
    """
    t = tangent[..., :3]
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, 1e-4, None))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = _skew(log_rot)
    skews_sq = skews @ skews
    eye = jnp.eye(3, dtype=tangent.dtype)
    R = fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3): tangent [b,6] -> [b,3,4].

    Near-zero branches use the same Taylor/Pade forms as the reference
    (``camera/lie_groups.py:65-119``) expressed with ``jnp.where``.
    """
    lin = tangent[..., :3]
    ang = tangent[..., 3:]

    theta2 = jnp.sum(ang * ang, axis=-1, keepdims=True)  # [b,1]
    near_zero = theta2 < 1e-4  # theta < 1e-2, tested on theta2 pre-sqrt

    # Double-where: sqrt has an infinite derivative at 0, and NaN from the
    # untaken branch leaks through jnp.where's gradient (0 * nan = nan) —
    # with a zero-initialized pose table that poisons training at step 1.
    # theta_nz is exact for every non-near row; near rows use theta2-only
    # Taylor forms, so the dummy value never reaches an output.
    one = jnp.ones_like(theta2)
    theta2_nz = jnp.where(near_zero, one, theta2)
    theta_nz = jnp.sqrt(theta2_nz)
    theta3_nz = theta_nz * theta2_nz

    sine = jnp.sin(theta_nz)
    cosine = jnp.where(near_zero, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta_nz))
    sine_by_theta = jnp.where(near_zero, 0.5 * cosine + 0.5, sine / theta_nz)
    one_minus_cos_by_t2 = jnp.where(
        near_zero, 0.5 * sine_by_theta, (1.0 - cosine) / theta2_nz
    )

    outer = ang[..., :, None] * ang[..., None, :]  # [b,3,3]
    eye = jnp.eye(3, dtype=tangent.dtype)
    R = (
        one_minus_cos_by_t2[..., None] * outer
        + cosine[..., None] * eye
        + sine_by_theta[..., None] * _skew(ang)
    )

    # Translation: V @ lin with stable coefficient forms.
    sine_by_theta_t = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine_by_theta)
    one_minus_cos_by_t2_t = jnp.where(
        near_zero, 0.5 - theta2 / 24.0, one_minus_cos_by_t2
    )
    theta_minus_sine_by_t3 = jnp.where(
        near_zero, 1.0 / 6.0 - theta2 / 120.0, (theta_nz - sine) / theta3_nz
    )
    trans = (
        sine_by_theta_t * lin
        + one_minus_cos_by_t2_t * jnp.cross(ang, lin)
        + theta_minus_sine_by_t3 * ang * jnp.sum(ang * lin, axis=-1, keepdims=True)
    )
    return jnp.concatenate([R, trans[..., :, None]], axis=-1)
