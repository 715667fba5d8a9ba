"""Reflectance (color) MLP conditioned on geometry features, view dir,
point-light position, and the shadow / specular hints.

Capability parity with ``fields/reflectance_network.py`` in iamNCJ/NRHints:
input = [pts, PE(view, L=4), normal, PE(pl, L=4), feat(256), PE(vis, L=4),
PE(spec, L=4)] -> 4x256 ReLU weight-norm MLP -> sigmoid RGB.  The hint
channels only exist when the corresponding hint is enabled (static config,
so the traced graph has a fixed input width).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nrhints_tpu.core.encodings import nerf_encoding, nerf_encoding_dim
from nrhints_tpu.fields.mlp import (
    apply_linear_any,
    maybe_weight_norm_params,
    torch_default_linear_init,
)


@dataclass(frozen=True)
class ReflectanceNetConfig:
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multi_res: int = 4
    squeeze_out: bool = True
    compute_dtype: str = "float32"
    """Matmul operand dtype ("float32" or "bfloat16"); accumulation,
    activations, and master weights stay f32 (see fields/mlp.py)."""


def reflectance_input_dim(
    cfg: ReflectanceNetConfig,
    d_feature: int,
    shadow_hint: bool,
    specular_hint: bool,
    specular_hint_len: int,
) -> int:
    d = 3 + 3 + 3 + 3 + d_feature  # pts, view, normal, pl, feat (raw channels)
    d += (nerf_encoding_dim(3, cfg.multi_res) - 3) * 2  # PE extras for view & pl
    if shadow_hint:
        d += nerf_encoding_dim(1, cfg.multi_res)
    if specular_hint:
        d += nerf_encoding_dim(specular_hint_len, cfg.multi_res)
    return d


def reflectance_init(
    key: jax.Array,
    cfg: ReflectanceNetConfig = ReflectanceNetConfig(),
    d_feature: int = 256,
    d_out: int = 3,
    shadow_hint: bool = True,
    specular_hint: bool = True,
    specular_hint_len: int = 4,
) -> dict:
    d0 = reflectance_input_dim(cfg, d_feature, shadow_hint, specular_hint, specular_hint_len)
    dims = [d0] + [cfg.d_hidden] * cfg.n_layers + [d_out]
    params = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        w, b = torch_default_linear_init(keys[i], dims[i], dims[i + 1])
        params[f"lin{i}"] = maybe_weight_norm_params(w, b, cfg.weight_norm)
    return params


def reflectance_forward(
    params: dict,
    cfg: ReflectanceNetConfig,
    points: jnp.ndarray,  # [N, 3]
    normals: jnp.ndarray,  # [N, 3]
    view_dirs: jnp.ndarray,  # [N, 3]
    feature_vectors: jnp.ndarray,  # [N, F]
    point_lights: jnp.ndarray,  # [N, 3]
    visibilities: jnp.ndarray | None = None,  # [N, 1]
    specular_cue: jnp.ndarray | None = None,  # [N, R]
) -> jnp.ndarray:
    """-> [N, 3] RGB in [0, 1].  Input concat order matches the reference
    (``fields/reflectance_network.py:77-84``)."""
    view_enc = nerf_encoding(view_dirs, cfg.multi_res, include_input=True)
    pl_enc = nerf_encoding(point_lights, cfg.multi_res, include_input=True)
    parts = [points, view_enc, normals, pl_enc, feature_vectors]
    if visibilities is not None:
        parts.append(nerf_encoding(visibilities, cfg.multi_res, include_input=True))
    if specular_cue is not None:
        parts.append(nerf_encoding(specular_cue, cfg.multi_res, include_input=True))
    h = jnp.concatenate(parts, axis=-1)

    n_lin = cfg.n_layers + 1
    cdt = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)
    if cdt is not None:
        # bf16 activations end-to-end (f32 accumulation inside each dot) —
        # halves the HBM traffic of the saved residuals; see fields/sdf.py.
        h = h.astype(cdt)
    for i in range(n_lin):
        h = apply_linear_any(params[f"lin{i}"], h, compute_dtype=cdt)
        if i < n_lin - 1:
            h = jax.nn.relu(h)
            if cdt is not None:
                h = h.astype(cdt)
    if cfg.squeeze_out:
        h = jax.nn.sigmoid(h)
    return h
