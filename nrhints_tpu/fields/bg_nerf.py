"""Relighting-aware background NeRF over NeRF++ inverted-sphere coordinates.

Capability parity with ``fields/nerf_density_field.py`` in iamNCJ/NRHints:
8x256 ReLU MLP with a skip at layer 4 on PE(pts4, L=10); the view branch
takes concat(view_dir, pl_pos) jointly PE'd at L=4 — so the background is
conditioned on the moving point light.  Points are 4-D inverted-sphere
coordinates (x/r, y/r, z/r, 1/r) produced by the renderer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from nrhints_tpu.core.encodings import nerf_encoding, nerf_encoding_dim
from nrhints_tpu.fields.mlp import linear_apply, linear_params, torch_default_linear_init


@dataclass(frozen=True)
class BgNeRFConfig:
    d_hidden: int = 256
    n_layers: int = 8
    multi_res: int = 10
    multi_res_view: int = 4
    skips: Tuple[int, ...] = (4,)
    d_in: int = 4
    d_in_view: int = 6


def bg_nerf_init(key: jax.Array, cfg: BgNeRFConfig = BgNeRFConfig()) -> dict:
    d_pts = nerf_encoding_dim(cfg.d_in, cfg.multi_res)
    d_view = nerf_encoding_dim(cfg.d_in_view, cfg.multi_res_view)
    W = cfg.d_hidden
    params = {}
    keys = iter(jax.random.split(key, cfg.n_layers + 4))

    in_dim = d_pts
    for i in range(cfg.n_layers):
        params[f"pts_lin{i}"] = linear_params(*torch_default_linear_init(next(keys), in_dim, W))
        # Note the reference concatenates the skip AFTER the layer's relu
        # (nerf-pytorch convention), so the NEXT layer sees W + d_pts inputs.
        in_dim = W + d_pts if i in cfg.skips else W

    params["views_lin0"] = linear_params(*torch_default_linear_init(next(keys), d_view + W, W // 2))
    params["feature"] = linear_params(*torch_default_linear_init(next(keys), W, W))
    params["alpha"] = linear_params(*torch_default_linear_init(next(keys), W, 1))
    params["rgb"] = linear_params(*torch_default_linear_init(next(keys), W // 2, 3))
    return params


def bg_nerf_forward(
    params: dict,
    cfg: BgNeRFConfig,
    pts4: jnp.ndarray,  # [N, 4] inverted-sphere coords
    view_dirs: jnp.ndarray,  # [N, 3]
    pl_positions: jnp.ndarray,  # [N, 3]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (density [N, 1], raw rgb [N, 3])."""
    pts_enc = nerf_encoding(pts4, cfg.multi_res, include_input=True)
    view_pl = jnp.concatenate([view_dirs, pl_positions], axis=-1)
    view_enc = nerf_encoding(view_pl, cfg.multi_res_view, include_input=True)

    h = pts_enc
    for i in range(cfg.n_layers):
        h = jax.nn.relu(linear_apply(params[f"pts_lin{i}"], h))
        if i in cfg.skips:
            h = jnp.concatenate([pts_enc, h], axis=-1)

    alpha = linear_apply(params["alpha"], h)
    feature = linear_apply(params["feature"], h)
    h = jnp.concatenate([feature, view_enc], axis=-1)
    h = jax.nn.relu(linear_apply(params["views_lin0"], h))
    rgb = linear_apply(params["rgb"], h)
    return alpha, rgb
