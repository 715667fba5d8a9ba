"""Loss, optimizer, train state, and the jitted/sharded training step.

Reference behavior reproduced (iamNCJ/NRHints):
* loss = L1(rgb)/batch + igr_weight * eikonal masked to the inside-sphere
  mask (``pipelines/base_pipeline.py:50-69``; note the reference feeds the
  r<1.0 mask through ``relax_inside_sphere`` — see SURVEY.md §2.3)
* Adam with per-group lr (renderer lr vs ray-generator opt_lr,
  ``pipelines/base_pipeline.py:32-37``) under a shared warmup+cosine factor
  (``trainer/trainer.py:99-113``)
* cos_anneal_ratio = min(1, step/anneal_end) as a traced scalar
* geometry warmup is a *static* variant selected by the trainer per phase.

TPU-native: one ``train_step`` jitted with donated state; under a mesh the
batch is sharded over 'data' and params replicated, so grad reduction is an
XLA-fused psum — functionally identical to DDP's all-reduce but overlapped
by the compiler.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nrhints_tpu.camera.model import CameraModel
from nrhints_tpu.camera.rays import RayGeneratorConfig, generate_rays
from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.core.structs import PixelBundle, RenderOutput
from nrhints_tpu.render.renderer import ModelConfig, render_rays


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: Any  # {'renderer': ..., 'raygen': ...}
    opt_state: Any


def lr_factor_schedule(warm_up_end: int, end_iter: int, alpha: float):
    """Warmup-then-cosine learning-rate factor (reference lr_lambda,
    ``trainer/trainer.py:105-111``)."""

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warm_up_end, 1)
        progress = (step - warm_up_end) / jnp.maximum(end_iter - warm_up_end, 1)
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < warm_up_end, warm, cos)

    return factor


def batch_scale_lr_factor(cfg: SystemConfig, global_batch: int) -> float:
    """LR compensation for a scaled global batch (ParallelConfig.
    batch_scale_lr_rule): k = global_batch / configured batch."""
    k = global_batch / cfg.model.batch_size
    rule = cfg.parallel.batch_scale_lr_rule
    if k == 1.0 or rule == "none":
        return 1.0
    if rule == "sqrt":
        return float(k ** 0.5)
    if rule == "linear":
        return float(k)
    raise ValueError(f"unknown batch_scale_lr_rule: {rule!r}")


def make_optimizer(
    cfg: SystemConfig, lr_scale: float = 1.0
) -> optax.GradientTransformation:
    """Two Adam groups (renderer / raygen) under one shared decay factor.

    ``lr_scale`` multiplies both base rates — the trainer passes
    ``batch_scale_lr_factor`` when scale_global_batch is on."""
    factor = lr_factor_schedule(cfg.model.warm_up_end, cfg.model.end_iter, cfg.model.lr_alpha)
    tx_renderer = optax.adam(learning_rate=lambda s: lr_scale * cfg.model.lr * factor(s))
    tx_raygen = optax.adam(
        learning_rate=lambda s: lr_scale * cfg.ray_generator.opt_lr * factor(s)
    )

    def label_fn(params):
        return {
            "renderer": jax.tree_util.tree_map(lambda _: "renderer", params["renderer"]),
            "raygen": jax.tree_util.tree_map(lambda _: "raygen", params["raygen"]),
        }

    return optax.multi_transform(
        {"renderer": tx_renderer, "raygen": tx_raygen}, label_fn
    )


def compute_loss_dict(
    out: RenderOutput, rgb_gt: jnp.ndarray, igr_weight: float
) -> tuple[jnp.ndarray, dict]:
    batch = out.rgb.shape[0]
    rgb_loss = jnp.sum(jnp.abs(out.rgb - rgb_gt)) / (batch + 1e-5)
    grad_err = (jnp.linalg.norm(out.analytic_normals, axis=-1) - 1.0) ** 2
    mask = out.relax_inside_sphere
    eikonal_loss = jnp.sum(mask * grad_err) / (jnp.sum(mask) + 1e-5)
    loss = rgb_loss + eikonal_loss * igr_weight
    mse = jnp.mean((out.rgb - rgb_gt) ** 2)
    psnr = -10.0 * jnp.log10(mse + 1e-10)
    return loss, {
        "loss": loss,
        "rgb_loss": rgb_loss,
        "eikonal_loss": eikonal_loss,
        "s_val": jnp.mean(out.s_val),
        "psnr": psnr,
    }


def forward_pipeline(
    params: dict,
    buffers: dict,
    cfg: SystemConfig,
    camera: CameraModel,
    batch: PixelBundle,
    key: jax.Array | None,
    *,
    is_training: bool,
    geometry_warmup: bool,
    cos_anneal_ratio,
    mesh=None,
) -> RenderOutput:
    """Ray generation + rendering (the reference pipeline.forward).

    ``mesh`` partitions the fused Pallas kernels over 'data' (see
    render_rays); the rest of the pipeline shards under GSPMD either way.
    """
    rays = generate_rays(params["raygen"], buffers, camera, cfg.ray_generator, batch)
    background_rgb = (
        jnp.ones((1, 3)) if cfg.data.white_background else jnp.zeros((1, 3))
    )
    return render_rays(
        params["renderer"],
        cfg.model,
        rays,
        key,
        is_training=is_training,
        geometry_warmup=geometry_warmup,
        cos_anneal_ratio=cos_anneal_ratio,
        background_rgb=background_rgb,
        mesh=mesh,
    )


def make_train_step(
    cfg: SystemConfig,
    camera: CameraModel,
    buffers: dict,
    optimizer: optax.GradientTransformation,
    *,
    geometry_warmup: bool = False,
    donate: bool = True,
    mesh=None,
    compiler_options: dict | None = None,
):
    """Build the jitted train step for one (static) phase.

    The trainer holds two of these when geometry warmup is configured
    (warmup phase / normal phase) and switches at the warmup boundary —
    keeping both graphs free of dead branches.

    ``mesh``: pass the trainer's ('data',) mesh so the fused Pallas kernels
    partition over it (shard_map); None keeps the single-device program.

    ``compiler_options``: per-computation XLA options shipped inside the
    program payload (e.g. ``{"xla_tpu_scoped_vmem_limit_kib": 32768}``) —
    the only channel that reaches the axon remote compiler, whose env is
    fixed (PROFILE.md "scoped-vmem wall").
    """
    mcfg: ModelConfig = cfg.model
    anneal_end = mcfg.anneal_end

    def step_fn(state: TrainState, batch: PixelBundle, key: jax.Array):
        cos_anneal_ratio = (
            jnp.minimum(1.0, state.step.astype(jnp.float32) / anneal_end)
            if anneal_end > 0
            else jnp.asarray(1.0)
        )

        def loss_fn(params):
            out = forward_pipeline(
                params,
                buffers,
                cfg,
                camera,
                batch,
                key,
                is_training=True,
                geometry_warmup=geometry_warmup,
                cos_anneal_ratio=cos_anneal_ratio,
                mesh=mesh,
            )
            loss, metrics = compute_loss_dict(out, batch.rgb_gt, mcfg.igr_weight)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, metrics

    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_train_step_scan(
    cfg: SystemConfig,
    camera: CameraModel,
    buffers: dict,
    optimizer: optax.GradientTransformation,
    *,
    n_steps: int,
    geometry_warmup: bool = False,
    donate: bool = True,
    mesh=None,
    compiler_options: dict | None = None,
):
    """``n_steps`` train steps in ONE dispatch via ``lax.scan``.

    Takes a stacked batch pytree with a leading [n_steps] axis and returns
    the state after all steps plus the LAST step's metrics (the trainer only
    reads metrics at the logging interval, so per-step metrics would be
    wasted transfer).  The per-step RNG key is folded from the carried
    ``state.step`` inside the scan, so a run chunked as K-step dispatches
    draws the same keys as the single-step loop.

    Amortizes per-dispatch host/runtime overhead — a visible fraction of the
    ~17 ms flagship step when dispatching over the axon tunnel.
    """
    mcfg: ModelConfig = cfg.model
    anneal_end = mcfg.anneal_end

    def one_step(state: TrainState, batch_and_key):
        batch, key = batch_and_key
        cos_anneal_ratio = (
            jnp.minimum(1.0, state.step.astype(jnp.float32) / anneal_end)
            if anneal_end > 0
            else jnp.asarray(1.0)
        )

        def loss_fn(params):
            out = forward_pipeline(
                params,
                buffers,
                cfg,
                camera,
                batch,
                key,
                is_training=True,
                geometry_warmup=geometry_warmup,
                cos_anneal_ratio=cos_anneal_ratio,
                mesh=mesh,
            )
            return compute_loss_dict(out, batch.rgb_gt, mcfg.igr_weight)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            metrics,
        )

    def scan_fn(state: TrainState, batches: PixelBundle, key: jax.Array):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            state.step + jnp.arange(n_steps)
        )
        final_state, metrics_seq = jax.lax.scan(one_step, state, (batches, keys))
        last_metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics_seq)
        return final_state, last_metrics

    return jax.jit(
        scan_fn,
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )
