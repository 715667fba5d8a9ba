"""Neural SDF field: frequency-encoded 8x256 softplus MLP with geometric
(SAL sphere) initialization, weight norm, and a skip connection.

Capability parity with ``fields/sdf_field.py`` in iamNCJ/NRHints: input
scaled by ``scale`` (3.0), L=6 frequency encoding incl. raw input (39-d),
skip at layer 4 with 1/sqrt(2) rescale, dual heads (sdf scalar / 256-d
feature), sdf output divided by ``scale``, softplus(beta=100) activations.

TPU-first departures from the reference:
* Normals come from ``jax.vjp`` of the forward pass (one linearization gives
  sdf, feature, AND input gradient); the eikonal double-backward is then
  ordinary forward-over-reverse AD under jit — no ``create_graph`` machinery.
* Params are a flat pytree consumed either by the jnp apply below or by the
  fused Pallas kernel in ``nrhints_tpu/kernels``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from nrhints_tpu.core.encodings import (
    HashEncodingConfig,
    hash_encoding_apply,
    hash_encoding_init,
    nerf_encoding,
    nerf_encoding_dim,
)
from nrhints_tpu.fields.mlp import (
    apply_linear_any,
    maybe_weight_norm_params,
    torch_default_linear_init,
)


@dataclass(frozen=True)
class SDFNetConfig:
    d_in: int = 3
    d_out_feat: int = 256
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multi_res: int = 6
    init_bias: float = 0.5
    scale: float = 3.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    encoding: str = "frequency"
    """Position encoding: "frequency" (reference default) or "hash"
    (Instant-NGP multiresolution hash grid — the optional fast path the
    reference ships unused in fields/encodings.py:237-371)."""
    compute_dtype: str = "float32"
    """Matmul operand dtype for the MLP ("float32" or "bfloat16").  Master
    weights, accumulation, activations, and the encoding always stay f32;
    "bfloat16" only casts the dot operands (full-rate MXU)."""
    # Hash-grid hyperparams (defaults mirror the reference's HashEncoding,
    # fields/encodings.py:237-258).  On TPU the encoding is gather-bound at
    # ~5 ns/row (PROFILE.md "SDF encoding"); hash_levels=8 with
    # hash_features_per_level=4 keeps the same 32-d output with HALF the
    # gather/scatter rows and is the recommended TPU configuration.
    hash_levels: int = 16
    hash_min_res: int = 16
    hash_max_res: int = 1024
    hash_log2_size: int = 19
    hash_features_per_level: int = 2

    @property
    def hash_config(self) -> HashEncodingConfig:
        return HashEncodingConfig(
            num_levels=self.hash_levels,
            min_res=self.hash_min_res,
            max_res=self.hash_max_res,
            log2_hashmap_size=self.hash_log2_size,
            features_per_level=self.hash_features_per_level,
        )

    @property
    def d_encoded(self) -> int:
        if self.encoding == "hash":
            return self.d_in + self.hash_config.out_dim
        return nerf_encoding_dim(self.d_in, self.multi_res, include_input=True)


def _layer_dims(cfg: SDFNetConfig):
    """Per-hidden-layer (in_dim, out_dim); skip layers shrink the previous
    layer's output so concat([x, inputs]) re-fills the hidden width."""
    d0 = cfg.d_encoded
    dims = [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out_feat + 1]
    io = []
    for i in range(cfg.n_layers):
        out_dim = dims[i + 1] - d0 if (i + 1) in cfg.skip_in else dims[i + 1]
        in_dim = dims[i]
        io.append((in_dim, out_dim))
    return io, dims


def sdf_init(key: jax.Array, cfg: SDFNetConfig = SDFNetConfig()) -> dict:
    """Geometric (SAL) initialization to a sphere of radius ``init_bias``:
    hidden weights ~ N(0, sqrt(2)/sqrt(out)); the encoding channels are
    zeroed at the input and skip layers; output heads get near-constant
    weights sqrt(pi)/sqrt(d_last) and bias -init_bias*scale."""
    io, dims = _layer_dims(cfg)
    d0 = cfg.d_encoded
    params = {}
    keys = jax.random.split(key, cfg.n_layers + 3)
    bias = cfg.init_bias * cfg.scale
    if cfg.encoding == "hash":
        params["hash"] = hash_encoding_init(keys[-3], cfg.hash_config)

    for i, (in_dim, out_dim) in enumerate(io):
        if cfg.geometric_init:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = jax.random.normal(keys[i], (in_dim, out_dim)) * std
            b = jnp.zeros((out_dim,))
            if cfg.multi_res > 0 and i == 0:
                # Only raw xyz rows active at the input layer.
                w = w.at[cfg.d_in :, :].set(0.0)
            elif cfg.multi_res > 0 and i in cfg.skip_in:
                # Zero the encoding part of the concatenated skip input
                # (last d0 - d_in rows).
                w = w.at[-(d0 - cfg.d_in) :, :].set(0.0)
        else:
            # The reference applies SAL init only under geometric_init;
            # otherwise layers keep torch.nn.Linear defaults.
            w, b = torch_default_linear_init(keys[i], in_dim, out_dim)
        params[f"lin{i}"] = maybe_weight_norm_params(w, b, cfg.weight_norm)

    for name, out_dim, k in (("sdf", 1, keys[-2]), ("feat", dims[-1] - 1, keys[-1])):
        if cfg.geometric_init:
            mean = math.sqrt(math.pi) / math.sqrt(dims[-1])
            sign = -1.0 if cfg.inside_outside else 1.0
            w = sign * mean + 1e-4 * jax.random.normal(k, (dims[-2], out_dim))
            b = jnp.full((out_dim,), -sign * bias)
        else:
            w, b = torch_default_linear_init(k, dims[-2], out_dim)
        params[f"out_{name}"] = maybe_weight_norm_params(w, b, cfg.weight_norm)
    return params


def sdf_forward(params: dict, cfg: SDFNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] -> [N, 1 + d_out_feat]: column 0 is the SDF, rest the feature."""
    if cfg.encoding == "hash":
        # Scene lives in the unit sphere; map to the hash grid's unit cube.
        x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
        hash_feat = hash_encoding_apply(params["hash"], x01, cfg.hash_config)
        x = x * cfg.scale
        inputs = jnp.concatenate([x, hash_feat], axis=-1)
    else:
        x = x * cfg.scale
        inputs = nerf_encoding(x, cfg.multi_res, include_input=True)
    h = inputs
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    cdt = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)
    if cdt is not None:
        # Carry activations in the compute dtype end-to-end: the dots take
        # bf16 operands (full-rate MXU) AND the residuals XLA saves for the
        # backward pass are half-width — the f32 path is HBM-bound on
        # exactly those saved activations.  Accumulation stays f32 inside
        # each dot; the softplus runs in f32 on the accumulated value.
        h = h.astype(cdt)
        inputs_c = inputs.astype(cdt)
    for i in range(cfg.n_layers):
        if i in cfg.skip_in:
            h = jnp.concatenate([h, inputs if cdt is None else inputs_c], axis=-1) * inv_sqrt2
        h = apply_linear_any(params[f"lin{i}"], h, compute_dtype=cdt)
        h = jax.nn.softplus(100.0 * h) / 100.0
        if cdt is not None:
            h = h.astype(cdt)
    sdf = apply_linear_any(params["out_sdf"], h, compute_dtype=cdt) / cfg.scale
    feat = apply_linear_any(params["out_feat"], h, compute_dtype=cdt)
    return jnp.concatenate([sdf, feat], axis=-1)


def sdf_only(params: dict, cfg: SDFNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] -> [N] signed distance."""
    return sdf_forward(params, cfg, x)[..., 0]


def sdf_value_feat_grad(
    params: dict, cfg: SDFNetConfig, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One linearization returning (sdf [N], feat [N,F], grad_x sdf [N,3]).

    The vjp cotangent selects the SDF channel, so the input gradient is the
    analytic normal direction; differentiating through this (for the eikonal
    loss) is plain nested AD.  Replaces the reference's
    ``torch.autograd.grad(create_graph=True)`` (``fields/sdf_field.py:136-148``).
    """
    out, vjp_fn = jax.vjp(lambda p: sdf_forward(params, cfg, p), x)
    cot = jnp.zeros_like(out).at[..., 0].set(1.0)
    (grad,) = vjp_fn(cot)
    return out[..., 0], out[..., 1:], grad


def sdf_value_and_dirderiv(
    params: dict, cfg: SDFNetConfig, x: jnp.ndarray, dirs: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sdf [N], dirs . grad_x sdf [N]) via ONE forward-mode tangent.

    Used by the shadow march, whose SDF->alpha conversion only consumes the
    ray-direction cosine of the gradient — a single JVP is ~2x cheaper than
    materializing the full gradient through a VJP.
    """
    f = lambda p: sdf_forward(params, cfg, p)[..., 0]
    sdf, dcos = jax.jvp(f, (x,), (dirs,))
    return sdf, dcos
