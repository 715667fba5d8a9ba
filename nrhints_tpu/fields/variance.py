"""NeuS single-variance (deviation) network: one learnable scalar.

inv_s = exp(10 * variance), matching ``SingleVarianceNetwork``
(``models/neus_hint_model.py:104-110`` in iamNCJ/NRHints).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class VarianceConfig:
    init_val: float = 0.3


def variance_init(cfg: VarianceConfig = VarianceConfig()) -> dict:
    return {"variance": jnp.asarray(cfg.init_val, dtype=jnp.float32)}


def inv_s_from_params(params: dict) -> jnp.ndarray:
    """Scalar inv_s, clipped to [1e-6, 1e6] like the reference (:337)."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
