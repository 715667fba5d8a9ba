"""Pixel -> ray generation, with optional learned SE(3)/SO3xR3 camera-pose
deltas and per-image point-light deltas (differentiable JAX params).

Behavior parity with ``camera/ray_generator.py`` in iamNCJ/NRHints:
+0.5 pixel centers, OpenGL-style (-y, -z) directions, synthetic pose/light
noise buffers, learned per-image adjustments applied as left-multiplied
[R|t] deltas, near/far from unit-sphere mid-point +/- 1 (NeuS convention)
or camera zn/zf.

Pure function of (params, buffers, pixel_bundle); the adjustment tables are
ordinary trainable pytree leaves so pose optimization is just including them
in the optimizer — no special machinery.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from nrhints_tpu.camera.model import CameraModel
from nrhints_tpu.core.brdf import normalize
from nrhints_tpu.core.lie import exp_map_SE3, exp_map_SO3xR3
from nrhints_tpu.core.structs import PixelBundle, RayBundle


@dataclass(frozen=True)
class RayGeneratorConfig:
    override_near_far_from_sphere: bool = True
    cam_opt_mode: Literal["off", "SO3xR3", "SE3"] = "off"
    pl_opt: bool = False
    opt_lr: float = 3e-5
    cam_position_noise_std: float = 0.0
    cam_orientation_noise_std: float = 0.0
    pl_position_noise_std: float = 0.0


def ray_generator_init(
    key: jax.Array, cfg: RayGeneratorConfig, num_cameras: int
) -> tuple[dict, dict]:
    """Returns (trainable params, fixed noise buffers)."""
    params: dict = {}
    buffers: dict = {}
    if cfg.cam_opt_mode in ("SO3xR3", "SE3"):
        params["cam_pose_adjustment"] = jnp.zeros((num_cameras, 6))
    elif cfg.cam_opt_mode != "off":
        raise ValueError(f"Unknown cam_opt_mode: {cfg.cam_opt_mode}")
    if cfg.pl_opt:
        params["pl_adjustment"] = jnp.zeros((num_cameras, 3))

    k_cam, k_pl = jax.random.split(key)
    if cfg.cam_position_noise_std != 0.0 or cfg.cam_orientation_noise_std != 0.0:
        std = jnp.array(
            [cfg.cam_position_noise_std] * 3 + [cfg.cam_orientation_noise_std] * 3
        )
        tangent = jax.random.normal(k_cam, (num_cameras, 6)) * std[None, :]
        buffers["cam_pose_noise"] = exp_map_SE3(tangent)
    if cfg.pl_position_noise_std != 0.0:
        buffers["pl_noise"] = (
            jax.random.normal(k_pl, (num_cameras, 3)) * cfg.pl_position_noise_std
        )
    return params, buffers


def generate_rays(
    params: dict,
    buffers: dict,
    camera: CameraModel,
    cfg: RayGeneratorConfig,
    pixels: PixelBundle,
) -> RayBundle:
    """Flat pixel batch -> rays.  ``pixels.img_indices is None`` (video
    views) is a static structural case: no noise / learned deltas apply."""
    x = pixels.w_indices.astype(jnp.float32) + 0.5
    y = pixels.h_indices.astype(jnp.float32) + 0.5
    img_indices = pixels.img_indices

    dirs = jnp.stack(
        [
            (x - camera.cx) / camera.fx,
            -(y - camera.cy) / camera.fy,
            -jnp.ones_like(x),
        ],
        axis=-1,
    )  # [B, 3]
    R = pixels.poses[..., :3, :3]
    t = pixels.poses[..., :3, 3:]

    if "cam_pose_noise" in buffers and img_indices is not None:
        dRt = buffers["cam_pose_noise"][img_indices]
        dR, dt = dRt[..., :3, :3], dRt[..., :3, 3:]
        R = dR @ R
        t = dt + dR @ t

    if cfg.cam_opt_mode != "off" and img_indices is not None:
        exp = exp_map_SO3xR3 if cfg.cam_opt_mode == "SO3xR3" else exp_map_SE3
        dRt = exp(params["cam_pose_adjustment"][img_indices])
        dR, dt = dRt[..., :3, :3], dRt[..., :3, 3:]
        R = dR @ R
        t = dt + dR @ t

    pls = pixels.pls
    if "pl_noise" in buffers and img_indices is not None:
        pls = pls + buffers["pl_noise"][img_indices]
    if cfg.pl_opt and img_indices is not None:
        pls = pls + params["pl_adjustment"][img_indices]

    rays_d = jnp.sum(dirs[..., None, :] * R, axis=-1)
    rays_d = normalize(rays_d)
    rays_o = t[..., 0]

    if cfg.override_near_far_from_sphere:
        a = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
        mid = 0.5 * (-b) / a
        near = mid - 1.0
        far = mid + 1.0
    else:
        near = jnp.full_like(rays_o[..., :1], camera.zn)
        far = jnp.full_like(rays_o[..., :1], camera.zf)

    return RayBundle(
        origins=rays_o,
        directions=rays_d,
        pl_positions=pls,
        nears=near,
        fars=far,
    )
