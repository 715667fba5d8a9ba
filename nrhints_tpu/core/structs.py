"""Batched data structures passed between the data, camera, and render layers.

The PyTorch reference carries these in a 379-line ``TensorDataclass``
abstraction (``utils/tensor_dataclass.py`` in iamNCJ/NRHints); in JAX the same
role is played by registered pytree dataclasses, which compose with
``jit``/``vmap``/shardings for free.  Fields mirror the reference containers:

* ``PixelBundle``  ~ ``RawPixelBundle``   (``data/data_loader.py:80-88``)
* ``RayBundle``    ~ ``RayBundle``        (``camera/ray_utils.py:215-247``)
* ``RenderOutput`` ~ ``RenderOutput``     (``models/neus_hint_model.py:216-233``)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PixelBundle:
    """A batch of sampled pixels (the raw training/eval unit).

    Shapes are ``[*batch, ...]``; all fields share the leading batch shape.
    ``img_indices`` is None for procedurally generated (video) views, which
    also have no ground truth.
    """

    h_indices: jnp.ndarray  # [*bs] float or int pixel row
    w_indices: jnp.ndarray  # [*bs] pixel column
    poses: jnp.ndarray  # [*bs, 4, 4] camera-to-world
    pls: jnp.ndarray  # [*bs, 3] point-light position
    img_indices: Optional[jnp.ndarray] = None  # [*bs] int32
    rgb_gt: Optional[jnp.ndarray] = None  # [*bs, 3]

    @property
    def batch_shape(self):
        return self.h_indices.shape

    def reshape(self, *shape) -> "PixelBundle":
        def r(x, extra):
            return None if x is None else x.reshape(*shape, *extra)

        return PixelBundle(
            h_indices=r(self.h_indices, ()),
            w_indices=r(self.w_indices, ()),
            poses=r(self.poses, (4, 4)),
            pls=r(self.pls, (3,)),
            img_indices=r(self.img_indices, ()),
            rgb_gt=r(self.rgb_gt, (3,)),
        )

    def flatten(self) -> "PixelBundle":
        return self.reshape(-1)

    def __getitem__(self, idx) -> "PixelBundle":
        def g(x):
            return None if x is None else x[idx]

        return PixelBundle(
            h_indices=g(self.h_indices),
            w_indices=g(self.w_indices),
            poses=g(self.poses),
            pls=g(self.pls),
            img_indices=g(self.img_indices),
            rgb_gt=g(self.rgb_gt),
        )


@struct.dataclass
class RayBundle:
    """A batch of rays with their lighting condition."""

    origins: jnp.ndarray  # [*bs, 3]
    directions: jnp.ndarray  # [*bs, 3] unit-norm
    pl_positions: jnp.ndarray  # [*bs, 3]
    nears: jnp.ndarray  # [*bs, 1]
    fars: jnp.ndarray  # [*bs, 1]

    @property
    def batch_shape(self):
        return self.origins.shape[:-1]


@struct.dataclass
class RenderOutput:
    """Per-ray render results (mirrors reference RenderOutput fields).

    ``relax_inside_sphere`` deliberately reproduces the reference behavior of
    carrying the r<1.0 mask (``models/neus_hint_model.py:745``) so the eikonal
    loss masks at radius 1.0; see SURVEY.md §2.3.
    """

    rgb: jnp.ndarray  # [*bs, 3]
    depth: jnp.ndarray  # [*bs, 1]
    weights: jnp.ndarray  # [*bs, n_samples]
    s_val: jnp.ndarray  # [*bs, 1]
    inside_sphere: jnp.ndarray  # [*bs, n_samples]
    relax_inside_sphere: jnp.ndarray  # [*bs, n_samples]
    analytic_normals: jnp.ndarray  # [*bs, n_samples, 3]
    normalized_analytic_normals: jnp.ndarray  # [*bs, n_samples, 3]
    visibilities: Optional[jnp.ndarray] = None  # [*bs, 1] shadow map
    specular_cue: Optional[jnp.ndarray] = None  # [*bs, n_samples, n_rough]

    def reshape(self, *shape) -> "RenderOutput":
        def r(x, extra):
            return None if x is None else x.reshape(*shape, *extra)

        ns = self.weights.shape[-1]
        return RenderOutput(
            rgb=r(self.rgb, (3,)),
            depth=r(self.depth, (1,)),
            weights=r(self.weights, (ns,)),
            s_val=r(self.s_val, (1,)),
            inside_sphere=r(self.inside_sphere, (self.inside_sphere.shape[-1],)),
            relax_inside_sphere=r(
                self.relax_inside_sphere, (self.relax_inside_sphere.shape[-1],)
            ),
            analytic_normals=r(
                self.analytic_normals, (self.analytic_normals.shape[-2], 3)
            ),
            normalized_analytic_normals=r(
                self.normalized_analytic_normals,
                (self.normalized_analytic_normals.shape[-2], 3),
            ),
            visibilities=r(self.visibilities, (1,)),
            specular_cue=None
            if self.specular_cue is None
            else r(self.specular_cue, self.specular_cue.shape[-2:]),
        )


def tree_concat(items, axis=0):
    """Concatenate a list of identical pytrees along ``axis`` (td_concat analog)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=axis), *items)
