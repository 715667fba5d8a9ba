"""Linear-layer primitives: plain and weight-normalized, as param pytrees.

Design: every field network in this framework is a dict-of-arrays pytree plus
a pure ``apply`` function.  This keeps the hot path a flat chain of
``x @ w + b`` matmuls that XLA tiles straight onto the MXU, makes shardings
trivial (params are replicated leaves), and lets Pallas kernels consume the
exact same weight arrays without any module-object indirection.

Weight norm matches torch's ``nn.utils.weight_norm`` over ``dim=0`` of a
``[out, in]`` torch weight: each output unit's weight row is reparameterized
as ``g * v / ||v||``.  We store ``v`` transposed as ``[in, out]`` (JAX
matmul convention), so the norm is over axis 0 per column.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_default_linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Replicates torch.nn.Linear default init distribution:
    kaiming-uniform(a=sqrt(5)) for the weight -> U(-1/sqrt(in), 1/sqrt(in)),
    and the same bound for the bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound, dtype=dtype)
    return w, b


def linear_params(w: jnp.ndarray, b: jnp.ndarray) -> dict:
    return {"w": w, "b": b}


def _dot_f32(x: jnp.ndarray, w: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """x @ w with optional reduced-precision operands and f32 accumulation.

    ``compute_dtype="bfloat16"`` casts both operands at the dot (full-rate
    MXU on TPU) while keeping the accumulator, bias add, and every
    activation in f32 — standard mixed precision with f32 master weights.
    Gradients flow through the casts, so backward matmuls get the same
    treatment from XLA's AD.
    """
    if compute_dtype is not None and jnp.dtype(compute_dtype) != x.dtype:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jax.lax.dot_general(
        x,
        w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def linear_apply(params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    return _dot_f32(x, params["w"], compute_dtype) + params["b"]


def weight_norm_params(w: jnp.ndarray, b: jnp.ndarray) -> dict:
    """Wrap a direct weight ``w [in, out]`` into weight-norm parameterization
    with ``g`` initialized to the per-column norm (torch semantics: the
    initial effective weight equals ``w`` exactly)."""
    g = jnp.linalg.norm(w, axis=0)
    return {"v": w, "g": g, "b": b}


def weight_norm_apply(
    params: dict, x: jnp.ndarray, eps: float = 0.0, compute_dtype=None
) -> jnp.ndarray:
    v = params["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    w = v * (params["g"][None, :] / (norm + eps))
    return _dot_f32(x, w, compute_dtype) + params["b"]


def weight_norm_effective_weight(params: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize (w, b) from weight-norm params — used by fused kernels so
    the normalization math runs once per step, not once per point."""
    v = params["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    return v * (params["g"][None, :] / norm), params["b"]


def maybe_weight_norm_params(w: jnp.ndarray, b: jnp.ndarray, weight_norm: bool) -> dict:
    """Layer params honoring a config's weight_norm flag (the reference
    wraps in nn.utils.weight_norm only when configured)."""
    return weight_norm_params(w, b) if weight_norm else linear_params(w, b)


def apply_linear_any(params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Apply a layer in either parameterization (dispatch on the pytree
    structure, which is static under jit)."""
    if "v" in params:
        return weight_norm_apply(params, x, compute_dtype=compute_dtype)
    return linear_apply(params, x, compute_dtype)


def effective_weight(params: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(w, b) of a layer in either parameterization."""
    if "v" in params:
        return weight_norm_effective_weight(params)
    return params["w"], params["b"]
