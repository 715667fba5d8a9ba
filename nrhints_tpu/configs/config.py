"""System configuration: frozen nested dataclasses with CLI presets.

Mirrors the reference config surface (``configs/main_config.py`` in
iamNCJ/NRHints): presets ``nr-hints``, ``nr-hints-cam-opt`` (default),
``pl-naive``; component configs colocated with their components; identical
flag spellings where sensible so reference scripts translate 1:1.  The CLI
itself is a small tyro-like dotted-flag parser (``cli.py``) since tyro isn't
available in this image.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from nrhints_tpu.camera.rays import RayGeneratorConfig
from nrhints_tpu.data.manager import DataManagerConfig
from nrhints_tpu.render.renderer import ModelConfig, RendererConfig


@dataclass(frozen=True)
class IntervalsConfig:
    log_metrics: int = 200
    save_ckpt: int = 5_000
    render_test_views: int = 250_000
    render_video: int = 1_000_000
    dump_mesh: int = 500_000


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh / distribution configuration (no reference analog — the
    reference's parallelism is implicit in its DDP launcher)."""

    data_axis_size: int = -1
    """Size of the 'data' mesh axis; -1 = all visible devices (divided by
    sample_axis_size when that is > 1)."""
    sample_axis_size: int = 1
    """Second mesh axis 'sample' sharding the shadow march's per-ray sample
    dimension (renderer._shadow_transmittance_sample_sharded) — the
    context-parallel analog of this workload (SURVEY.md §5.7).  Use > 1
    only when the mesh is larger than the per-step ray count (the
    reference-semantics constant 512-ray global batch on big slices);
    otherwise pure ray-DP occupies every chip already and is cheaper."""
    scale_global_batch: bool = False
    """If True, global batch = batch_size * n_devices (the reference keeps
    the global batch constant regardless of world size; that is the
    default here too).  Keeping 512 rays global on a v5e-8 leaves 64
    rays/chip — single-digit kernel blocks per chip and poor MXU occupancy
    (BASELINE.md §"Scaling plan"); scaling the batch is how multi-chip
    throughput is actually harvested."""
    batch_scale_lr_rule: str = "linear"
    """LR compensation when scale_global_batch multiplies the batch by k:
    "linear" (lr *= k), "sqrt" (lr *= sqrt(k)), or "none".  Measured on the
    8-device CPU mesh at equal rays-seen (8x batch): linear tracks the
    unscaled loss trajectory best (within ~6-15%), sqrt lags ~40-50%, none
    ~60-150% (tests/test_train.py::test_scaled_batch_lr_rule; BASELINE.md
    §"Scaling plan")."""
    multihost: bool = False
    """Call jax.distributed.initialize() before building the mesh."""
    steps_per_dispatch: int = 1
    """Train steps folded into one device dispatch via lax.scan.  >1
    amortizes per-dispatch host/runtime overhead (worth several percent when
    the device step is ~17 ms); the update math is bit-identical to
    single-step dispatches (tests/test_train.py::test_train_step_scan_*).
    Interval hooks fire when a dispatch crosses the interval boundary."""


@dataclass(frozen=True)
class SystemConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataManagerConfig = field(default_factory=DataManagerConfig)
    ray_generator: RayGeneratorConfig = field(default_factory=RayGeneratorConfig)
    intervals: IntervalsConfig = field(default_factory=IntervalsConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    ckpt_path: Optional[str] = None
    base_dir: str = "outputs"
    exp_name: str = "baseline"
    scene_name: str = "scene"
    seed: int = 3407
    evaluation_only: bool = False
    final_mesh_resolution: int = 1024
    """Marching-cubes grid resolution for the final mesh dump (the reference
    hardcodes 1024 at trainer/trainer.py:266)."""
    profile_steps: Optional[str] = None
    """Capture a jax.profiler device trace over a step range, e.g. "100-110";
    written to <run_dir>/profile for xprof/tensorboard (SURVEY.md §5.1 —
    the reference has no profiling subsystem)."""
    use_wandb: bool = False
    """Mirror metrics/images to wandb (the reference's only logging sink,
    trainer/trainer.py:71-80).  JSONL/CSV to the run dir are always on;
    wandb is opt-in and degrades silently when the package is absent."""


def nr_hints() -> SystemConfig:
    """NeuS Relighting with Hints."""
    return SystemConfig()


def nr_hints_cam_opt() -> SystemConfig:
    """NeuS Relighting with Hints and Camera Optimization."""
    return SystemConfig(ray_generator=RayGeneratorConfig(cam_opt_mode="SO3xR3"))


def pl_naive() -> SystemConfig:
    """NeuS Relighting with Naive Point Light (no hints)."""
    return SystemConfig(
        model=ModelConfig(renderer=RendererConfig(shadow_hint=False, specular_hint=False))
    )


PRESETS = {
    "nr-hints": nr_hints,
    "nr-hints-cam-opt": nr_hints_cam_opt,
    "pl-naive": pl_naive,
}

DEFAULT_PRESET = "nr-hints-cam-opt"
