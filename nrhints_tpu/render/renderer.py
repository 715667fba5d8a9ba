"""NeuS-with-hints volumetric renderer: one pure jittable function from rays
to radiance, depth, weights, and hint maps.

Behavioral parity with ``models/neus_hint_model.py`` in iamNCJ/NRHints
(``NeuSHintRenderer``): stratified 64 samples, 4 rounds of SDF-guided
importance up-sampling (inv_s = 64*2^i), sigmoid-CDF SDF->alpha with
cos-annealing, transmittance compositing, alpha-blend/max-weight/sphere-trace
depth, shadow hint as the final transmittance of a secondary march from the
light toward the estimated hit point (``:373-432``), Cook-Torrance specular
hint at 4 roughnesses (``:588-616``), optional NeRF++ background
(``:434-473``), geometry-warmup zeroing of both hints.

TPU-native design decisions:
* Everything is static-shaped: the hierarchical z-buffer grows
  64->80->96->112->128 through an unrolled python loop over compile-time
  round counts; merges are argsort+gather, never dynamic concat.
* no_grad blocks become ``lax.stop_gradient`` on block outputs; XLA prunes
  the corresponding backward subgraphs.
* Normals come from one ``jax.vjp`` linearization (sdf, feature, and input
  gradient together); the eikonal double-backward is nested AD.
* The partial shadow hint's python chunk loop becomes ``lax.map`` over
  fixed-size blocks.
* Geometry warmup and train/eval are *static* variants (the trainer selects
  the right compiled function per phase) so the hot graph carries no dead
  branches.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nrhints_tpu.core.brdf import cook_torrance_specular, normalize
from nrhints_tpu.core.sampling import (
    merge_z_vals,
    neus_up_sample,
    perturb_z_vals_within_bins,
    sample_pdf,
    stratified_z_vals,
    transmittance,
)
from nrhints_tpu.core.structs import RayBundle, RenderOutput
from nrhints_tpu.fields.bg_nerf import BgNeRFConfig, bg_nerf_forward, bg_nerf_init
from nrhints_tpu.fields.reflectance import (
    ReflectanceNetConfig,
    reflectance_forward,
    reflectance_init,
)
from nrhints_tpu.fields.sdf import (
    SDFNetConfig,
    sdf_forward,
    sdf_init,
    sdf_only,
    sdf_value_and_dirderiv,
    sdf_value_feat_grad,
)
from nrhints_tpu.fields.variance import VarianceConfig, inv_s_from_params, variance_init
from nrhints_tpu.parallel.mesh import shard_rays_call

from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class RendererConfig:
    """Static renderer configuration (hashable; safe as a jit static arg)."""

    use_outside_nerf: bool = False
    n_samples: int = 64
    n_importance_samples: int = 64
    n_outside_samples: int = 32
    normal_type: str = "normalized_analytic"  # or "analytic"
    up_sample_steps: int = 4
    depth_type: str = "alpha_blending"  # or "maximum_point" | "sphere_tracing"
    shadow_hint: bool = True
    force_shadow_map: bool = False
    specular_hint: bool = True
    force_specular_cue: bool = False
    shadow_ray_offset: float = 1e-2
    specular_roughness: Tuple[float, ...] = (0.02, 0.05, 0.13, 0.34)
    shadow_hint_gradient: bool = False
    specular_hint_gradient: bool = False
    n_shadow_importance_clip: int = -1
    n_shadow_samples: int = 64
    n_shadow_importance_samples: int = 64
    override_near_far_to_sphere: bool = True
    fused_kernels: str = "auto"
    """Pallas fused-march kernels: "auto" (on TPU backends), "on", "off".
    The fused path computes identical math with TPU-shaped kernels (bitonic
    merges, matmul prefix scans); tiny float differences vs the jnp path."""
    fused_interpret: bool = False
    """Run the Pallas kernels in interpret mode (CPU-executable) — lets the
    CPU test mesh exercise the exact fused program structure, including its
    shard_map partitioning (tests/test_shard_fused.py, dryrun_multichip)."""
    march_dtype: str = "bfloat16"
    """Weight/activation dtype of the march MLP sweeps (the marches are
    no-grad samplers; bf16 measured numerically equivalent on the
    procedural scenes — PROFILE.md "March-kernel dtype"/quality_bf16).
    Shipping default "bfloat16" since round 5: with the sweeps as XLA
    full-batch streams, f32 softplus chains run at ~59 TF/s vs ~83 bf16
    (amortized), and the in-step A/B separates cleanly (12.349/12.455 vs
    12.489/12.562 ms — PROFILE.md round-5 phase J)."""
    importance_block_rays: int = 128
    shadow_block_rays: int = 16
    """Per-grid-step ray blocks for the two march kernels.  Under the
    round-5 ``march_rounds_impl="xla"`` default, ``importance_block_rays``
    (and ``shadow_refine_block_rays``) size the per-round MACHINERY
    kernels (merge + inverse-CDF only — no MLP working set), whose
    measured optimum is 128; with ``march_rounds_impl="pallas"`` they size
    the full rounds kernels, where the VMEM-bounded optima were 32
    (PROFILE.md "March-kernel block_rays sweep")."""
    shadow_split: bool = True
    """Run the shadow march as two kernels (refinement via the importance
    kernel + a final-sweep kernel) instead of one monolith.  Each half's
    VMEM working set stands alone, so both fit larger ray blocks;
    ``shadow_block_rays`` then sizes the final sweep and
    ``shadow_refine_block_rays`` the refinement.  Shipping default since
    round 3: the split step measures 15.62 ms vs the 16.06 ms monolith at
    512 rays (PROFILE.md "Split shadow march in-step")."""
    shadow_refine_block_rays: int = 128
    importance_split: bool = False
    """Run the importance march as sweep + rounds kernels (the shadow
    split's trick); implied by ``march_sweep_impl="xla"``."""
    march_sweep_impl: str = "xla"
    """Initial-sweep implementation of the split marches: "xla" (the same
    ``_mlp_sdf_3d`` jnp program compiled by XLA into full-batch [B*S, F]
    matmuls) or "pallas" (the round-4 in-kernel sweep).  Shipping default
    "xla" since round 5: the full-batch XLA sweep runs at the ~55 TF/s
    256-wide-chain rate instead of ~30 in-kernel — isolated importance
    2.60 -> 2.16 ms, in-step 13.43 -> 13.01 ms (PROFILE.md round-5)."""
    shadow_final_impl: str = "pallas"
    """Final dual sdf+dirderiv sweep of the split shadow march: "pallas"
    (final-sweep kernel) or "xla" (same ``_shadow_final_math`` program on
    the full batch)."""
    march_rounds_impl: str = "xla"
    """Refinement-round execution: "xla" (per-round machinery kernels +
    full-batch XLA round sweeps — ``march.py::_rounds_xla``) or "pallas"
    (one kernel, fori_loop rounds; the round-4 path).  Shipping default
    "xla" since round 5: with sweeps at the ~55 TF/s full-batch XLA chain
    rate, the step measures 12.38-12.58 ms vs 12.74-12.83 sweep-only and
    13.43 for the round-4 defaults (PROFILE.md round-5 phase I)."""
    march_merge: str = "bitonic"
    """Per-round sorted-merge network inside the march kernels: "bitonic"
    (7-stage butterfly) or "rank" (comparison-count ranks + variable shift
    network).  Identical math; see PROFILE.md "March merge network" for the
    measured comparison behind the default."""
    reflectance_impl: str = "pallas"
    """Reflectance trunk implementation on the fused TRAIN path: "pallas"
    (the fused custom-VJP kernel) or "xla" (the jnp
    ``reflectance_forward`` as full-batch matmul streams).  Isolated the
    XLA stream wins (1.53 ms fwd / 2.49 fwd+bwd vs 1.94 / 2.63 at 65k
    points) but IN-STEP it loses cleanly (13.050/13.087 vs 12.484/12.500
    ms — its f32 HBM activation streams compete with the step's other
    traffic; the stash_xla lesson again), so training keeps the kernel
    (PROFILE.md round-5 phases M3/O1)."""
    eval_reflectance_impl: str = "xla"
    """Reflectance trunk on the no-grad EVAL path (``is_training=False``).
    With no backward in flight the isolated win survives in context:
    whole-image device render 893.5/895.2 ms vs 924.9/936.5 (73.3k vs
    70.9k rays/s, phase O2) — and the XLA trunk computes in f32, i.e.
    exactly the jnp program the torch-parity suite pins."""
    core_backward: str = "stash"
    """Backward schedule of the fused core custom-VJP ops: "stash" (forward
    writes per-layer activations to HBM; backward reads them instead of
    recomputing the forward chain — kernels/core_stash.py) or "recompute"
    (round-3 behavior: re-run the primal in-kernel and VJP it).  Shipping
    default "stash" since round 4: isolated SDF fwd+bwd 6.44 vs 8.42 ms,
    full step 14.74 vs 15.62 ms (PROFILE.md "Core backward schedule")."""
    core_block_pts_bwd: int = 128
    """Point-block of the core backward kernels (VMEM-bounded)."""


@dataclass(frozen=True)
class ModelConfig:
    """Full model config: fields + renderer + schedule hyperparameters."""

    sdf_network: SDFNetConfig = field(default_factory=SDFNetConfig)
    outside_nerf: BgNeRFConfig = field(default_factory=BgNeRFConfig)
    deviation_network: VarianceConfig = field(default_factory=VarianceConfig)
    reflectance_network: ReflectanceNetConfig = field(default_factory=ReflectanceNetConfig)
    renderer: RendererConfig = field(default_factory=RendererConfig)

    igr_weight: float = 0.1
    lr: float = 5e-4
    lr_alpha: float = 0.05
    warm_up_end: int = 5_000
    end_iter: int = 1_000_000
    anneal_end: int = 50_000
    geometry_warmup_end: int = 0

    batch_size: int = 512
    shadow_mini_chunk_size: int = 2048
    training_chunk_size: int = 512
    inference_chunk_size: int = 512
    """Rays per eval dispatch — a pure batching knob (no numeric effect;
    the evaluator clamps it to the image size).  Measured on TPU v5e:
    whole-image render throughput is flat from 512 to 8192 (the in-graph
    ``lax.map`` has no per-chunk dispatch cost), so the reference's 512
    (``pipelines/base_pipeline.py:110-120``) stays the default."""

    @property
    def has_shadow_hint(self) -> bool:
        return self.renderer.shadow_hint or self.renderer.force_shadow_map

    @property
    def has_specular_hint(self) -> bool:
        return self.renderer.specular_hint or self.renderer.force_specular_cue


def init_model_params(key: jax.Array, cfg: ModelConfig) -> dict:
    """Initialize all field parameters as one pytree."""
    k_sdf, k_color, k_bg = jax.random.split(key, 3)
    params = {
        "sdf": sdf_init(k_sdf, cfg.sdf_network),
        "variance": variance_init(cfg.deviation_network),
        "color": reflectance_init(
            k_color,
            cfg.reflectance_network,
            d_feature=cfg.sdf_network.d_out_feat,
            d_out=3,
            shadow_hint=cfg.renderer.shadow_hint,
            specular_hint=cfg.renderer.specular_hint,
            specular_hint_len=len(cfg.renderer.specular_roughness),
        ),
    }
    if cfg.renderer.use_outside_nerf:
        params["bg"] = bg_nerf_init(k_bg, cfg.outside_nerf)
    return params


# ---------------------------------------------------------------------------
# SDF -> alpha


def _neus_alpha(
    sdf: jnp.ndarray,  # [N]
    grads: jnp.ndarray,  # [N, 3]
    dirs: jnp.ndarray,  # [N, 3]
    dists: jnp.ndarray,  # [N]
    inv_s: jnp.ndarray,  # scalar
    cos_anneal_ratio: jnp.ndarray,
) -> jnp.ndarray:
    """Alpha from section SDF via the sigmoid-CDF ratio with cos annealing
    (reference get_alpha, ``models/neus_hint_model.py:333-357``)."""
    true_cos = jnp.sum(dirs * grads, axis=-1)
    return _neus_alpha_from_cos(sdf, true_cos, dists, inv_s, cos_anneal_ratio)


def _neus_alpha_from_cos(
    sdf: jnp.ndarray,
    true_cos: jnp.ndarray,
    dists: jnp.ndarray,
    inv_s: jnp.ndarray,
    cos_anneal_ratio,
) -> jnp.ndarray:
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Hierarchical sampling


def _use_fused(rcfg: RendererConfig) -> bool:
    if rcfg.fused_kernels == "on":
        return True
    if rcfg.fused_kernels == "off":
        return False
    return jax.default_backend() == "tpu"


def _fused_march_compatible(rcfg: RendererConfig, sdf_cfg=None) -> bool:
    """The fused kernels assume the canonical 64+4x16 buffer geometry and
    the frequency-encoded SDF (the hash-encoded field runs the XLA path)."""
    return (
        rcfg.n_samples == 64
        and rcfg.n_importance_samples == 64
        and rcfg.up_sample_steps == 4
        and (sdf_cfg is None or sdf_cfg.encoding == "frequency")
    )


def _fused_shadow_compatible(rcfg: RendererConfig, sdf_cfg=None) -> bool:
    return (
        rcfg.n_shadow_samples == 64
        and rcfg.n_shadow_importance_samples == 64
        and rcfg.up_sample_steps == 4
        and not rcfg.shadow_hint_gradient
        and (sdf_cfg is None or sdf_cfg.encoding == "frequency")
    )


def _ray_shard(mesh, rows: int):
    """(mesh, partition_spec, full_mesh) for sharding a per-ray (or
    per-point) kernel call whose leading axis has ``rows`` entries.

    Rows flatten-shard over ALL mesh axes when they divide the full mesh
    (on a 2-D ``('data','sample')`` mesh the kernels are still purely
    ray-parallel, so both axes serve as ray-DP).  When only the 'data'
    extent divides, falls back to 'data'-only sharding (compute replicated
    over 'sample').  ``(None, None, False)`` when no partitioning applies —
    the unwrapped call then still runs correctly, just unpartitioned."""
    if mesh is None or mesh.size <= 1:
        return None, None, False
    if rows % mesh.size == 0:
        return mesh, P(tuple(mesh.axis_names)), True
    if (
        "data" in mesh.axis_names
        and mesh.shape["data"] > 1
        and rows % mesh.shape["data"] == 0
    ):
        return mesh, P("data"), False
    return None, None, False


def _sample_axis_size(mesh) -> int:
    if mesh is None or "sample" not in getattr(mesh, "axis_names", ()):
        return 1
    return mesh.shape["sample"]


def _importance_sample_z(params, cfg: ModelConfig, rays_o, rays_d, z_vals, mesh=None):
    """4 rounds of up-sampling; returns the merged [B, n+n_imp] z buffer.

    Gradients are cut at the output (reference runs this under no_grad).
    """
    rcfg = cfg.renderer
    batch = z_vals.shape[0]
    n_per_round = rcfg.n_importance_samples // rcfg.up_sample_steps

    def sdf_at(z):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., :, None]
        return sdf_only(params["sdf"], cfg.sdf_network, pts.reshape(-1, 3)).reshape(
            batch, z.shape[-1]
        )

    march_mesh, march_spec, march_full = _ray_shard(mesh, batch)
    k_sample = _sample_axis_size(mesh)
    sample_ok = (
        k_sample > 1
        and batch % mesh.shape["data"] == 0
        and z_vals.shape[-1] % k_sample == 0
        and (rcfg.up_sample_steps == 0 or n_per_round % k_sample == 0)
    )
    fused_ok = _use_fused(rcfg) and _fused_march_compatible(rcfg, cfg.sdf_network)
    # Same preference order as the shadow march: fused kernels when they can
    # occupy the whole mesh, else the sample-sharded jnp march over every
    # device rather than a 'sample'-replicated kernel.
    if fused_ok and (march_full or not sample_ok or mesh is None or mesh.size <= 1):
        from nrhints_tpu.kernels.march import fused_importance_z

        def call(p, o, d, z):
            return fused_importance_z(
                p,
                cfg.sdf_network,
                o,
                d,
                z,
                block_rays=rcfg.importance_block_rays,
                interpret=rcfg.fused_interpret,
                mlp_dtype=rcfg.march_dtype,
                merge=rcfg.march_merge,
                split=(
                    rcfg.importance_split
                    or rcfg.march_sweep_impl == "xla"
                    or rcfg.march_rounds_impl == "xla"
                ),
                sweep_impl=rcfg.march_sweep_impl,
                rounds_impl=rcfg.march_rounds_impl,
            )

        # Per-shard ray blocks under a mesh (see shard_rays_call); rays
        # flatten-shard over every mesh axis when they divide it.
        call = shard_rays_call(
            call,
            march_mesh,
            in_specs=(P(), march_spec, march_spec, march_spec),
            out_specs=march_spec,
        )
        # The kernel has no AD rules; this whole block is no-grad anyway,
        # so cut tangents at the inputs (not just the output).
        sg = jax.lax.stop_gradient
        return call(sg(params["sdf"]), sg(rays_o), sg(rays_d), sg(z_vals))

    if sample_ok:
        return _importance_z_sample_sharded(params, cfg, rays_o, rays_d, z_vals, mesh)

    sdf = sdf_at(z_vals)
    for i in range(rcfg.up_sample_steps):
        new_z = neus_up_sample(
            rays_o, rays_d, z_vals, sdf, n_per_round, 64.0 * 2 ** i
        )
        last = i + 1 == rcfg.up_sample_steps
        if last:
            z_vals, _ = merge_z_vals(z_vals, new_z)
        else:
            new_sdf = sdf_at(new_z)
            z_vals, sdf = merge_z_vals(z_vals, new_z, sdf, new_sdf)
    return jax.lax.stop_gradient(z_vals)


def _importance_z_sample_sharded(params, cfg: ModelConfig, rays_o, rays_d, z_vals, mesh):
    """Importance up-sampling with the sample axis sharded over 'sample' —
    the same construction as ``_shadow_transmittance_sample_sharded`` (each
    round's SDF sweep runs on a 1/k sample slice per device; the tiny
    [rays, S] value vectors are all-gathered for the replicated CDF/merge
    bookkeeping).  No-grad like the unsharded march."""
    rcfg = cfg.renderer
    k = _sample_axis_size(mesh)
    n_per_round = rcfg.n_importance_samples // rcfg.up_sample_steps

    def march(sdf_params, o, d, z):
        s_idx = jax.lax.axis_index("sample")
        rays = z.shape[0]

        def sdf_at(zq):
            sl = zq.shape[-1] // k
            zc = jax.lax.dynamic_slice_in_dim(zq, s_idx * sl, sl, axis=1)
            pts = o[:, None, :] + d[:, None, :] * zc[..., :, None]
            vals = sdf_only(sdf_params, cfg.sdf_network, pts.reshape(-1, 3))
            return jax.lax.all_gather(
                vals.reshape(rays, sl), "sample", axis=1, tiled=True
            )

        sdf = sdf_at(z)
        for i in range(rcfg.up_sample_steps):
            new_z = neus_up_sample(o, d, z, sdf, n_per_round, 64.0 * 2 ** i)
            if i + 1 == rcfg.up_sample_steps:
                z, _ = merge_z_vals(z, new_z)
            else:
                z, sdf = merge_z_vals(z, new_z, sdf, sdf_at(new_z))
        return z

    march = jax.shard_map(
        march,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    sg = jax.lax.stop_gradient
    return march(sg(params["sdf"]), sg(rays_o), sg(rays_d), sg(z_vals))


# ---------------------------------------------------------------------------
# Shadow hint


def _shadow_transmittance(
    params,
    cfg: ModelConfig,
    pls: jnp.ndarray,  # [N, 3] light positions (one per shadow ray)
    target_points: jnp.ndarray,  # [N, 3]
    cos_anneal_ratio,
    key: jax.Array | None,
    mesh=None,
) -> jnp.ndarray:
    """Final transmittance of a march from the light to just before the
    target point -> [N, 1].  Mirrors reference get_visibility (:373-432):
    own stratified samples along the light ray, its own 4-round up-sampling
    with inv_s = 64*2^i, per-ray sample_dist = |light - target| / n."""
    rcfg = cfg.renderer
    n = rcfg.n_shadow_samples
    n_imp = rcfg.n_shadow_importance_samples
    up_steps = rcfg.up_sample_steps

    ray_o = pls
    d = target_points - ray_o
    light_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)  # [N,1]
    sample_dist = light_norm / n
    ray_d = d / light_norm

    t = jnp.linspace(0.0, 1.0, n, dtype=d.dtype)
    z_vals = t[None, :] * light_norm * (1.0 - rcfg.shadow_ray_offset)
    if key is not None:
        z_vals = perturb_z_vals_within_bins(z_vals, key)

    batch = z_vals.shape[0]

    march_mesh, march_spec, march_full = _ray_shard(mesh, batch)
    k_sample = _sample_axis_size(mesh)
    # Sample-axis sharding (SURVEY.md §5.7): usable when the 2-D mesh's
    # 'sample' extent divides every per-round sample count and the march is
    # no-grad (the shipping configuration; shadow_hint_gradient falls back).
    sample_ok = (
        k_sample > 1
        and not rcfg.shadow_hint_gradient
        and batch % mesh.shape["data"] == 0
        and n % k_sample == 0
        and (n_imp == 0 or up_steps == 0 or (n_imp // up_steps) % k_sample == 0)
        and (n + n_imp) % k_sample == 0
    )
    fused_ok = _use_fused(rcfg) and _fused_shadow_compatible(rcfg, cfg.sdf_network)
    # Prefer the fused kernels whenever they can occupy the WHOLE mesh; when
    # the rays cannot cover a 2-D mesh (march_spec falls back to 'data',
    # replicating the march over 'sample'), the sample-sharded jnp path uses
    # every device instead — faster than a k-way-replicated kernel for any
    # sample extent >= the fused win (~2x).
    if fused_ok and (march_full or not sample_ok or mesh is None or mesh.size <= 1):
        from nrhints_tpu.kernels.march import fused_shadow_tau

        def call(p, o, d, z, sdist, invs, anneal):
            # The monolith (shadow_split=False) has no sweep/final/rounds
            # halves — the impl knobs only apply to the split pipeline.
            s = rcfg.shadow_split
            return fused_shadow_tau(
                p,
                cfg.sdf_network,
                o,
                d,
                z,
                sdist,
                invs,
                anneal,
                block_rays=rcfg.shadow_block_rays,
                interpret=rcfg.fused_interpret,
                mlp_dtype=rcfg.march_dtype,
                split=s,
                refine_block_rays=rcfg.shadow_refine_block_rays,
                merge=rcfg.march_merge,
                sweep_impl=rcfg.march_sweep_impl if s else "pallas",
                final_impl=rcfg.shadow_final_impl if s else "pallas",
                rounds_impl=rcfg.march_rounds_impl if s else "pallas",
            )

        call = shard_rays_call(
            call,
            march_mesh,
            in_specs=(P(), march_spec, march_spec, march_spec, march_spec, P(), P()),
            out_specs=march_spec,
        )
        # No AD rules in the kernel; the shadow hint is no-grad here
        # (_fused_shadow_compatible excludes shadow_hint_gradient=True), so
        # cut tangents at every kernel input.
        sg = jax.lax.stop_gradient
        return call(
            sg(params["sdf"]),
            sg(ray_o),
            sg(ray_d),
            sg(z_vals),
            sg(sample_dist),
            sg(inv_s_from_params(params["variance"])),
            sg(jnp.asarray(cos_anneal_ratio, jnp.float32)),
        )

    if sample_ok:
        return _shadow_transmittance_sample_sharded(
            params, cfg, ray_o, ray_d, z_vals, sample_dist, cos_anneal_ratio, mesh
        )

    def sdf_at(z):
        pts = ray_o[:, None, :] + ray_d[:, None, :] * z[..., :, None]
        return sdf_only(params["sdf"], cfg.sdf_network, pts.reshape(-1, 3)).reshape(
            batch, z.shape[-1]
        )

    if n_imp > 0:
        sdf = sdf_at(z_vals)
        for i in range(up_steps):
            new_z = neus_up_sample(ray_o, ray_d, z_vals, sdf, n_imp // up_steps, 64.0 * 2 ** i)
            last = i + 1 == up_steps
            if last:
                z_vals, _ = merge_z_vals(z_vals, new_z)
            else:
                z_vals, sdf = merge_z_vals(z_vals, new_z, sdf, sdf_at(new_z))

    n_total = z_vals.shape[-1]
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], sample_dist], axis=-1
    )
    mid_z = z_vals + dists * 0.5
    pts = (ray_o[:, None, :] + ray_d[:, None, :] * mid_z[..., :, None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(ray_d[:, None, :], (batch, n_total, 3)).reshape(-1, 3)

    sdf_v, dcos = sdf_value_and_dirderiv(params["sdf"], cfg.sdf_network, pts, dirs)
    inv_s = inv_s_from_params(params["variance"])
    alpha = _neus_alpha_from_cos(
        sdf_v, dcos, dists.reshape(-1), inv_s, cos_anneal_ratio
    ).reshape(batch, n_total)
    taus = transmittance(alpha)
    return taus[..., -1:]


def _shadow_transmittance_sample_sharded(
    params, cfg: ModelConfig, ray_o, ray_d, z_vals, sample_dist, cos_anneal_ratio, mesh
) -> jnp.ndarray:
    """Shadow march with the per-ray sample axis sharded over 'sample'.

    The context-parallel analog of this workload (SURVEY.md §5.7): rays
    shard over 'data', samples over 'sample', so the march's MLP sweeps —
    its entire cost — occupy every device of a mesh LARGER than the ray
    count (the reference keeps the global batch at 512 rays regardless of
    world size, ``trainer/trainer.py:118`` in iamNCJ/NRHints, so ray-DP
    alone strands chips past 512-way).  Each refinement round evaluates the
    SDF on a 1/k slice of the samples per device and all-gathers the tiny
    [rays, S] value vector for the replicated CDF/merge bookkeeping; the
    final sweep all-gathers per-slice alphas and reduces the transmittance
    per ray.  Per-point math and gather order are identical to the
    unsharded jnp path, so results match it exactly.
    """
    rcfg = cfg.renderer
    n_imp = rcfg.n_shadow_importance_samples
    up_steps = rcfg.up_sample_steps
    k = _sample_axis_size(mesh)

    def march(sdf_params, o, d, z, sdist, invs, anneal):
        s_idx = jax.lax.axis_index("sample")
        rays = z.shape[0]

        def sdf_at(zq):
            sl = zq.shape[-1] // k
            zc = jax.lax.dynamic_slice_in_dim(zq, s_idx * sl, sl, axis=1)
            pts = o[:, None, :] + d[:, None, :] * zc[..., :, None]
            vals = sdf_only(sdf_params, cfg.sdf_network, pts.reshape(-1, 3))
            return jax.lax.all_gather(
                vals.reshape(rays, sl), "sample", axis=1, tiled=True
            )

        if n_imp > 0:
            sdf = sdf_at(z)
            for i in range(up_steps):
                new_z = neus_up_sample(o, d, z, sdf, n_imp // up_steps, 64.0 * 2 ** i)
                if i + 1 == up_steps:
                    z, _ = merge_z_vals(z, new_z)
                else:
                    z, sdf = merge_z_vals(z, new_z, sdf, sdf_at(new_z))

        n_total = z.shape[-1]
        dists = jnp.concatenate([z[..., 1:] - z[..., :-1], sdist], axis=-1)
        mid_z = z + dists * 0.5
        sl = n_total // k
        mid_c = jax.lax.dynamic_slice_in_dim(mid_z, s_idx * sl, sl, axis=1)
        dists_c = jax.lax.dynamic_slice_in_dim(dists, s_idx * sl, sl, axis=1)
        pts = (o[:, None, :] + d[:, None, :] * mid_c[..., :, None]).reshape(-1, 3)
        dirs = jnp.broadcast_to(d[:, None, :], (rays, sl, 3)).reshape(-1, 3)
        sdf_v, dcos = sdf_value_and_dirderiv(sdf_params, cfg.sdf_network, pts, dirs)
        alpha_c = _neus_alpha_from_cos(
            sdf_v, dcos, dists_c.reshape(-1), invs, anneal
        ).reshape(rays, sl)
        alpha = jax.lax.all_gather(alpha_c, "sample", axis=1, tiled=True)
        return transmittance(alpha)[..., -1:]

    march = jax.shard_map(
        march,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    # The sharded march is no-grad by construction (sample_ok excludes
    # shadow_hint_gradient); cut tangents at every input like the fused path.
    sg = jax.lax.stop_gradient
    return march(
        sg(params["sdf"]),
        sg(ray_o),
        sg(ray_d),
        sg(z_vals),
        sg(sample_dist),
        sg(inv_s_from_params(params["variance"])),
        sg(jnp.asarray(cos_anneal_ratio, jnp.float32)),
    )


# ---------------------------------------------------------------------------
# Background (NeRF++ inverted sphere)


def _render_outside(params, cfg: ModelConfig, rays_o, rays_d, rays_pl, z_vals, sample_dist):
    """Background color/alpha along z (reference render_outside :434-473)."""
    batch, n = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full((batch, 1), sample_dist, z_vals.dtype)],
        axis=-1,
    )
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis, 1.0 / dis], axis=-1).reshape(-1, 4)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (batch, n, 3)).reshape(-1, 3)
    pls = jnp.broadcast_to(rays_pl[:, None, :], (batch, n, 3)).reshape(-1, 3)

    density, raw_rgb = bg_nerf_forward(params["bg"], cfg.outside_nerf, pts4, dirs, pls)
    color = jax.nn.sigmoid(raw_rgb).reshape(batch, n, 3)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(batch, n)) * dists)
    return alpha, color


# ---------------------------------------------------------------------------
# Main entry


def render_rays(
    params: dict,
    cfg: ModelConfig,
    rays: RayBundle,
    key: jax.Array | None = None,
    *,
    is_training: bool = False,
    geometry_warmup: bool = False,
    cos_anneal_ratio: jnp.ndarray | float = 1.0,
    background_rgb: jnp.ndarray | None = None,
    mesh=None,
) -> RenderOutput:
    """Render a flat batch of rays -> RenderOutput.

    ``is_training`` and ``geometry_warmup`` are *static* — the trainer holds
    separately jitted variants.  ``cos_anneal_ratio`` is a traced scalar.

    ``mesh``: optional ('data',) device mesh.  The pure-XLA path partitions
    under GSPMD on its own; the fused Pallas kernels do NOT (no sharding
    rule for Mosaic custom calls), so under a multi-device mesh they are
    wrapped in ``shard_map`` over 'data' here.  Static and hashable — safe
    to close over in jitted callers.
    """
    rcfg = cfg.renderer
    rays_o, rays_d, rays_pl = rays.origins, rays.directions, rays.pl_positions
    batch = rays_o.shape[0]
    n_samples = rcfg.n_samples
    sample_dist = 2.0 / n_samples

    if key is None:
        if is_training:
            raise ValueError(
                "render_rays(is_training=True) requires a PRNG key: training "
                "uses stratified jitter and shadow-ray perturbation"
            )
        k_strat = k_shadow = None
    else:
        k_strat, k_out, k_shadow = jax.random.split(key, 3)

    z_vals = stratified_z_vals(
        rays.nears, rays.fars, n_samples, key=k_strat if is_training else None
    )

    if rcfg.n_importance_samples > 0:
        z_vals = _importance_sample_z(params, cfg, rays_o, rays_d, z_vals, mesh)

    # Background.
    background_alpha = None
    background_color = None
    if rcfg.use_outside_nerf:
        n_out = rcfg.n_outside_samples
        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (n_out + 1.0), n_out, dtype=z_vals.dtype)
        z_out = jnp.broadcast_to(z_out, (batch, n_out))
        if is_training and key is not None:
            z_out = perturb_z_vals_within_bins(z_out, k_out)
        z_out = rays.fars / jnp.flip(z_out, axis=-1) + 1.0 / n_samples
        z_feed, _ = merge_z_vals(z_vals, z_out)
        background_alpha, background_color = _render_outside(
            params, cfg, rays_o, rays_d, rays_pl, z_feed, sample_dist
        )

    n_total = z_vals.shape[-1]

    # Section midpoints and lengths.
    dists = jnp.concatenate(
        [
            z_vals[..., 1:] - z_vals[..., :-1],
            jnp.full((batch, 1), sample_dist, z_vals.dtype),
        ],
        axis=-1,
    )
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]  # [B,S,3]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pls_b = jnp.broadcast_to(rays_pl[:, None, :], pts.shape)

    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)
    pls_flat = pls_b.reshape(-1, 3)

    use_fused_core = _use_fused(rcfg) and cfg.sdf_network.encoding == "frequency"
    # The core ops are pointwise over the flattened [B*S] axis, so they can
    # flatten-shard over every mesh axis even when the ray count alone
    # cannot cover a 2-D mesh (B*S has 128x more rows).
    core_mesh, core_spec, _ = _ray_shard(mesh, batch * n_total)
    if use_fused_core:
        # Fused Pallas core: value + feature + analytic gradient in VMEM,
        # with a recompute-in-kernel custom VJP (the XLA path spills every
        # activation stream to HBM and is bandwidth-bound).
        from nrhints_tpu.kernels.core_mlp import fused_sdf_value_feat_grad

        def sdf_call(p, x):
            return fused_sdf_value_feat_grad(
                p,
                cfg.sdf_network,
                x,
                interpret=rcfg.fused_interpret,
                backward=rcfg.core_backward,
                block_pts_bwd=rcfg.core_block_pts_bwd,
            )

        # Sharded over the flattened [B*S] point axis (B divides => B*S
        # does).  Differentiable: shard_map's transpose psums the weight
        # cotangents of the replicated params operand.
        sdf_call = shard_rays_call(
            sdf_call,
            core_mesh,
            in_specs=(P(), core_spec),
            out_specs=(core_spec, core_spec, core_spec),
        )
        sdf, feat, grads = sdf_call(params["sdf"], pts_flat)
    else:
        sdf, feat, grads = sdf_value_feat_grad(params["sdf"], cfg.sdf_network, pts_flat)
    inv_s = inv_s_from_params(params["variance"])
    alpha = _neus_alpha(
        sdf, grads, dirs_flat, dists.reshape(-1), inv_s, cos_anneal_ratio
    ).reshape(batch, n_total)

    pts_norm = jnp.linalg.norm(pts_flat, axis=-1).reshape(batch, n_total)
    inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(alpha.dtype))
    relax_inside_sphere = jax.lax.stop_gradient((pts_norm < 1.2).astype(alpha.dtype))

    if background_alpha is not None:
        alpha_full = jnp.concatenate(
            [
                alpha * inside_sphere + background_alpha[:, :n_total] * (1.0 - inside_sphere),
                background_alpha[:, n_total:],
            ],
            axis=-1,
        )
    else:
        alpha_full = alpha

    weights = alpha_full * transmittance(alpha_full)
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    neus_weights = weights[:, :n_total]

    # Depth / hit points.
    if rcfg.depth_type == "alpha_blending":
        depths = jax.lax.stop_gradient(
            jnp.sum(mid_z * neus_weights, axis=-1, keepdims=True)
        )
    elif rcfg.depth_type == "maximum_point":
        max_idx = jnp.argmax(neus_weights, axis=-1, keepdims=True)
        depths = jax.lax.stop_gradient(jnp.take_along_axis(mid_z, max_idx, axis=-1))
    elif rcfg.depth_type == "sphere_tracing":
        depths = jax.lax.stop_gradient(
            _sphere_trace_depth(params, cfg, rays_o, rays_d, rays.fars)
        )
    else:
        raise ValueError(f"unknown depth_type {rcfg.depth_type}")
    hit_points = rays_o + rays_d * depths

    has_shadow = cfg.has_shadow_hint
    has_specular = cfg.has_specular_hint

    # Shadow hint.
    visibilities = None  # per point [B*S, 1]
    shadow_map = None  # per ray [B, 1]
    if has_shadow and not geometry_warmup:
        if rcfg.n_shadow_importance_clip == -1:
            vis = _shadow_transmittance(
                params,
                cfg,
                rays_pl,
                hit_points,
                cos_anneal_ratio,
                k_shadow if is_training else None,
                mesh,
            )
            if not rcfg.shadow_hint_gradient:
                vis = jax.lax.stop_gradient(vis)
            shadow_map = vis
            visibilities = jnp.broadcast_to(vis[:, None, :], (batch, n_total, 1)).reshape(-1, 1)
        else:
            visibilities, shadow_map = _partial_shadow_hint(
                params, cfg, rays_o, rays_d, rays_pl, z_vals, weights,
                cos_anneal_ratio, k_shadow if is_training else None, mesh,
            )
    elif has_shadow and geometry_warmup:
        visibilities = jnp.zeros((batch * n_total, 1), dtype=alpha.dtype)
        shadow_map = visibilities[:batch]

    # Normals.
    analytic_normal = grads  # [B*S, 3]
    normalized_normal = normalize(analytic_normal)

    # Specular hint at the blended hit point.
    specular_cue = None
    if has_specular and not geometry_warmup:
        hit_normal = jnp.sum(
            normalized_normal.reshape(batch, n_total, 3) * neus_weights[..., None],
            axis=1,
        )
        hit_normal = normalize(hit_normal)
        lit_dirs = normalize(rays_pl - hit_points)
        view_dirs = normalize(-rays_d)
        spec = cook_torrance_specular(
            hit_normal, lit_dirs, view_dirs, rcfg.specular_roughness
        )  # [B, R]
        if not rcfg.specular_hint_gradient:
            spec = jax.lax.stop_gradient(spec)
        specular_cue = jnp.broadcast_to(
            spec[:, None, :], (batch, n_total, spec.shape[-1])
        ).reshape(batch * n_total, -1)
    elif has_specular and geometry_warmup:
        specular_cue = jnp.zeros(
            (batch * n_total, len(rcfg.specular_roughness)), dtype=alpha.dtype
        )

    input_normal = analytic_normal if rcfg.normal_type == "analytic" else normalized_normal
    color_args = [
        pts_flat,
        input_normal,
        dirs_flat,
        feat,
        pls_flat,
        visibilities if rcfg.shadow_hint else None,
        specular_cue if rcfg.specular_hint else None,
    ]
    if use_fused_core:
        from nrhints_tpu.kernels.core_mlp import fused_reflectance_forward

        # Optional hint operands can't ride through shard_map as None;
        # close over the present/absent pattern instead (it is static).
        present = [a is not None for a in color_args]
        live_args = [a for a in color_args if a is not None]

        trunk_impl = (
            rcfg.reflectance_impl if is_training else rcfg.eval_reflectance_impl
        )

        def color_call(p, *live):
            it = iter(live)
            full = [next(it) if ok else None for ok in present]
            if trunk_impl == "xla":
                # Full-batch XLA trunk (still shard-mapped over rays so the
                # mesh partitioning matches the Pallas variant exactly).
                return reflectance_forward(p, cfg.reflectance_network, *full)
            return fused_reflectance_forward(
                p,
                cfg.reflectance_network,
                *full,
                interpret=rcfg.fused_interpret,
                backward=rcfg.core_backward,
            )

        color_call = shard_rays_call(
            color_call,
            core_mesh,
            in_specs=(P(),) + (core_spec,) * len(live_args),
            out_specs=core_spec,
        )
        sampled_color = color_call(params["color"], *live_args)
    else:
        sampled_color = reflectance_forward(
            params["color"], cfg.reflectance_network, *color_args
        )
    sampled_color = sampled_color.reshape(batch, n_total, 3)

    if background_alpha is not None:
        sampled_color = jnp.concatenate(
            [
                sampled_color * inside_sphere[..., None]
                + background_color[:, :n_total] * (1.0 - inside_sphere)[..., None],
                background_color[:, n_total:],
            ],
            axis=1,
        )

    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    s_val = jnp.broadcast_to(1.0 / inv_s, (batch,))[:, None]

    return RenderOutput(
        rgb=color,
        depth=depths,
        weights=weights,
        s_val=s_val,
        inside_sphere=inside_sphere,
        # Reference quirk kept deliberately: relax_inside_sphere carries the
        # r<1.0 mask (models/neus_hint_model.py:745); see SURVEY.md §2.3.
        relax_inside_sphere=inside_sphere,
        analytic_normals=analytic_normal.reshape(batch, n_total, 3),
        normalized_analytic_normals=normalized_normal.reshape(batch, n_total, 3),
        visibilities=shadow_map if has_shadow else None,
        specular_cue=None
        if not has_specular
        else specular_cue.reshape(batch, n_total, -1),
    )


def _partial_shadow_hint(
    params, cfg: ModelConfig, rays_o, rays_d, rays_pl, z_vals, weights,
    cos_anneal_ratio, key, mesh=None,
):
    """Partial-hint variant (n_shadow_importance_clip > 0): march shadow rays
    to ``n_clip`` evenly strided sample points per camera ray, chunked with
    ``lax.map`` to bound memory (replaces the reference's python mini-chunk
    loop, ``models/neus_hint_model.py:554-576``)."""
    rcfg = cfg.renderer
    batch, n_total = z_vals.shape
    n_clip = rcfg.n_shadow_importance_clip
    if n_total % n_clip:
        raise ValueError(
            f"n_shadow_importance_clip ({n_clip}) must divide the total "
            f"sample count ({n_total})"
        )
    clip_ratio = n_total // n_clip

    hint_z = z_vals[:, ::clip_ratio][:, :n_clip]
    hint_pts = (
        rays_o[:, None, :] + rays_d[:, None, :] * hint_z[..., :, None]
    ).reshape(-1, 3)
    hint_pls = jnp.broadcast_to(rays_pl[:, None, :], (batch, n_clip, 3)).reshape(-1, 3)

    total = batch * n_clip
    chunk = min(cfg.shadow_mini_chunk_size, total)
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    if pad:
        hint_pts = jnp.concatenate([hint_pts, jnp.ones((pad, 3), hint_pts.dtype)], 0)
        hint_pls = jnp.concatenate([hint_pls, jnp.zeros((pad, 3), hint_pls.dtype)], 0)

    keys = (
        jax.random.split(key, n_chunks)
        if key is not None
        else jnp.zeros((n_chunks, 2), dtype=jnp.uint32)
    )

    def body(args):
        pts_c, pls_c, k = args
        kk = k if key is not None else None
        return _shadow_transmittance(params, cfg, pls_c, pts_c, cos_anneal_ratio, kk, mesh)

    vis = jax.lax.map(
        body,
        (
            hint_pts.reshape(n_chunks, chunk, 3),
            hint_pls.reshape(n_chunks, chunk, 3),
            keys,
        ),
    ).reshape(-1, 1)[:total]
    if not rcfg.shadow_hint_gradient:
        vis = jax.lax.stop_gradient(vis)

    vis = vis.reshape(batch, n_clip, 1)
    vis_full = jnp.repeat(vis, clip_ratio, axis=1)  # [B, n_total, 1]
    # Argmax over the NeuS samples only: with the background NeRF on,
    # `weights` extends past n_total, and an argmax landing on a background
    # sample would index out of vis_full (the reference's gather would
    # hard-error there, models/neus_hint_model.py:574-575 — deliberate fix).
    max_idx = jnp.argmax(weights[:, :n_total], axis=1, keepdims=True)
    shadow_map = jnp.take_along_axis(vis_full[..., 0], max_idx, axis=1)
    return vis_full.reshape(-1, 1), shadow_map


def _sphere_trace_depth(
    params,
    cfg: ModelConfig,
    rays_o,
    rays_d,
    fars,
    n_iters: int = 2000,
    eps: float = 1e-4,
    far: float = 100.0,
):
    """Sphere tracing depth with the reference's constants — 2000 masked
    iterations, 1e-4 convergence, escape bound 100 (reference forward calls
    sphere_trace(rays_o, rays_d, 2000, 1e-4, 100), neus_hint_model.py:528).
    A ``while_loop`` reproduces the reference's all-converged early break
    (data-dependent trip counts are fine outside the batch dims on TPU).
    ``fars`` is accepted for signature stability but, like the reference,
    the escape test uses the fixed ``far`` bound."""
    del fars
    # no-grad in the reference; cut tangents at the inputs so reverse-mode
    # AD never needs to differentiate through the while_loop.
    params = jax.lax.stop_gradient(params)
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)

    def cond(carry):
        i, _pts, _depths, all_done = carry
        return jnp.logical_and(i < n_iters, jnp.logical_not(all_done))

    def body(carry):
        i, pts, depths, _ = carry
        sdf = sdf_only(params["sdf"], cfg.sdf_network, pts)[:, None]
        converged = (jnp.abs(sdf) < eps) | (depths > far)
        pts = jnp.where(converged, pts, pts + sdf * rays_d)
        depths = jnp.where(converged, depths, depths + sdf)
        return i + 1, pts, depths, jnp.all(converged)

    _, _, depths, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.asarray(0), rays_o, jnp.zeros_like(rays_o[:, :1]), jnp.asarray(False)),
    )
    return depths


# ---------------------------------------------------------------------------
# SDF grid evaluation (mesh export feed)


def extract_sdf_grid(
    params: dict,
    cfg: ModelConfig,
    bound_min,
    bound_max,
    resolution: int,
    block: int = 64,
) -> jnp.ndarray:
    """Evaluate -sdf on a dense grid -> [res, res, res] (device compute;
    marching cubes runs on host via the native extension).  Mirrors
    extract_fields (``models/neus_hint_model.py:68-83``) with ``lax.map``
    over fixed blocks instead of a python triple loop."""
    bmin = jnp.asarray(bound_min, dtype=jnp.float32)
    bmax = jnp.asarray(bound_max, dtype=jnp.float32)
    xs = jnp.linspace(bmin[0], bmax[0], resolution)
    ys = jnp.linspace(bmin[1], bmax[1], resolution)
    zs = jnp.linspace(bmin[2], bmax[2], resolution)
    grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)

    total = grid.shape[0]
    chunk = block ** 3
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    if pad:
        grid = jnp.concatenate([grid, jnp.zeros((pad, 3), grid.dtype)], axis=0)

    vals = jax.lax.map(
        lambda p: -sdf_only(params["sdf"], cfg.sdf_network, p),
        grid.reshape(n_chunks, chunk, 3),
    ).reshape(-1)[:total]
    return vals.reshape(resolution, resolution, resolution)
