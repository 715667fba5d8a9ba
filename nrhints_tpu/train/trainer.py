"""Training orchestration: setup, hot loop, interval hooks (checkpoint /
eval / mesh / video), resume, and observability.

Reference surface: ``trainer/trainer.py`` in iamNCJ/NRHints (1M-step loop,
interval-driven save/test/mesh/video, per-rank sampler seeds, RNG-state
checkpointing, resume-newest).  The distributed architecture is rebuilt
TPU-native per SURVEY.md §5.8: no subprocess launcher, no NCCL, no DDP —
one process per host, a ('data',) mesh over all chips, sharded batches,
replicated params, XLA-fused gradient psum.  Eval views are strided over
hosts like the reference strides them over ranks.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nrhints_tpu.camera.rays import ray_generator_init
from nrhints_tpu.configs.cli import config_to_dict
from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import SceneData, parse_load_nr_data
from nrhints_tpu.eval.evaluator import Evaluator
from nrhints_tpu.parallel import mesh as mesh_lib
from nrhints_tpu.render.renderer import extract_sdf_grid, init_model_params
from nrhints_tpu.train.checkpoint import CheckpointIO
from nrhints_tpu.train.logging import MetricsLogger
from nrhints_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_train_step_scan,
)


class Trainer:
    def __init__(self, config: SystemConfig, scene: Optional[SceneData] = None):
        self.config = config

        if config.parallel.multihost:
            mesh_lib.initialize_multihost()
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()

        # Device mesh: ray data-parallelism, optionally x sample-parallelism
        # for the shadow march (ParallelConfig.sample_axis_size).
        # (-1 passes through so make_mesh owns the divisibility warning when
        # devices don't divide by sample_axis_size.)
        self.mesh = mesh_lib.make_mesh(
            config.parallel.data_axis_size,
            sample_axis_size=config.parallel.sample_axis_size,
        )

        # Run dir + config dump + logger.
        self.log_dir = (
            pathlib.Path(config.base_dir) / config.exp_name / config.scene_name
        )
        self.log_dir.mkdir(parents=True, exist_ok=True)
        if self.is_main_process:
            (self.log_dir / "config.json").write_text(
                json.dumps(config_to_dict(config), indent=2)
            )
        self.logger = MetricsLogger(
            self.log_dir,
            use_wandb=config.use_wandb and self.process_index == 0,
            wandb_kwargs={
                "project": "NR2023",  # the reference's project name
                "group": config.exp_name,
                "name": config.scene_name,
                "id": f"{config.exp_name}_{config.scene_name}".replace("/", "_"),
                "resume": "allow",
            },
        )

        # Data.
        if scene is None:
            scene = parse_load_nr_data(
                config.data.path,
                half_res=config.data.half_res,
                white_background=config.data.white_background,
            )
        self.scene = scene
        self.camera = scene.camera

        # Global batch is constant across world sizes (reference
        # trainer.py:118) unless scale_global_batch is set.
        global_batch = config.model.batch_size
        if config.parallel.scale_global_batch:
            global_batch *= len(jax.devices())
        if global_batch % self.process_count:
            raise ValueError(
                f"global batch size ({global_batch}) must be divisible by "
                f"the number of hosts ({self.process_count})"
            )
        self.local_batch = global_batch // self.process_count
        self.global_batch = global_batch

        self.data_manager = DataManager(
            scene,
            batch_size=self.local_batch,
            strategy=config.data.pixel_sampling_strategy,
            training_view_num_limit=config.data.view_num_limit,
            image_idx_rng_seed=config.seed,
            pixel_idx_rng_seed=config.seed,
            local_rank=self.process_index,
        )

        # Params / optimizer / state.
        key = jax.random.PRNGKey(config.seed)
        k_model, k_raygen, self._train_key = jax.random.split(key, 3)
        renderer_params = init_model_params(k_model, config.model)
        raygen_params, self.buffers = ray_generator_init(
            k_raygen, config.ray_generator, scene.total_image_num
        )
        params = {"renderer": renderer_params, "raygen": raygen_params}
        from nrhints_tpu.train.step import batch_scale_lr_factor

        self.optimizer = make_optimizer(
            config, lr_scale=batch_scale_lr_factor(config, self.global_batch)
        )
        self.state: TrainState = init_train_state(params, self.optimizer)
        self.state = mesh_lib.replicate(self.mesh, self.state)
        self.buffers = mesh_lib.replicate(self.mesh, self.buffers)

        # Two static train-step variants (geometry warmup / normal).  The
        # mesh rides along so the fused Pallas kernels shard_map over it.
        self._step_normal = make_train_step(
            config, self.camera, self.buffers, self.optimizer,
            geometry_warmup=False, mesh=self.mesh,
        )
        self._step_warmup = (
            make_train_step(
                config, self.camera, self.buffers, self.optimizer,
                geometry_warmup=True, mesh=self.mesh,
            )
            if config.model.geometry_warmup_end > 0
            else None
        )
        # Scanned K-step-per-dispatch variants, built lazily on first use,
        # keyed by (geometry_warmup, n_steps).
        self._scan_steps: dict[tuple, object] = {}

        self.evaluator = Evaluator(config, self.camera, self.buffers, mesh=self.mesh)
        self.ckpt_io = CheckpointIO(self.log_dir)
        self.global_step = 0
        self._load_ckpt()

        # Optional jax.profiler capture window ("A-B" step range).
        self._profile_range = None
        if config.profile_steps:
            a, b = (int(v) for v in config.profile_steps.split("-"))
            self._profile_range = (a, b)
        self._profiling = False
        self._profile_done = False

    # ------------------------------------------------------------------

    @property
    def is_main_process(self) -> bool:
        return self.process_index == 0

    def _load_ckpt(self) -> None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state
        )
        state, step = self.ckpt_io.load_newest(abstract, self.config.ckpt_path)
        if state is None:
            return
        self.state = mesh_lib.replicate(self.mesh, state)
        self.global_step = int(step) if step is not None else int(state.step)
        last_world = self.ckpt_io.load_world_size(self.global_step)
        if last_world is None or last_world == self.process_count:
            sidecar = self.ckpt_io.load_rng_sidecar(self.global_step)
            if sidecar is not None:
                self.data_manager.sampler.set_state(sidecar["sampler"])
                self._train_key = jnp.asarray(sidecar["train_key"])

    def _save_ckpt(self) -> None:
        self.ckpt_io.save(
            self.global_step,
            jax.device_get(self.state),
            rng_sidecar={
                "sampler": self.data_manager.sampler.get_state(),
                "train_key": np.asarray(self._train_key),
            },
            world_size=self.process_count,
        )

    # ------------------------------------------------------------------

    def _maybe_profile(self) -> None:
        """Start/stop the jax.profiler window.  Crossing-based so K-step
        dispatch chunks can't jump over the [a, b) range; if the window is
        overshot entirely, at least one dispatch is still captured."""
        if self._profile_range is None:
            return
        a, b = self._profile_range
        if not self._profiling and not self._profile_done and self.global_step >= a:
            jax.profiler.start_trace(str(self.log_dir / "profile"))
            self._profiling = True
        elif self._profiling and self.global_step >= b:
            self._stop_profile()

    def _stop_profile(self) -> None:
        if self._profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiling = False
            self._profile_done = True

    def _in_warmup(self) -> bool:
        return (
            self._step_warmup is not None
            and self.global_step < self.config.model.geometry_warmup_end
        )

    def _next_chunk_size(self) -> int:
        """Steps for the next dispatch: the configured steps_per_dispatch,
        unless the chunk would cross the geometry-warmup boundary or
        end_iter — partial chunks run as single steps so only the one
        scanned program ever compiles."""
        k = self.config.parallel.steps_per_dispatch
        if k <= 1:
            return 1
        gs = self.global_step
        limit = self.config.model.end_iter - gs
        wend = self.config.model.geometry_warmup_end
        if self._step_warmup is not None and gs < wend:
            limit = min(limit, wend - gs)
        return k if k <= limit else 1

    def train_iter(self, n_steps: int = 1) -> dict:
        self._maybe_profile()
        key = self._train_key
        warmup = self._in_warmup()
        if n_steps == 1:
            batch = self.data_manager.next_train_batch()
            batch = mesh_lib.shard_batch(self.mesh, batch)
            step_fn = self._step_warmup if warmup else self._step_normal
            self.state, metrics = step_fn(
                self.state, batch, jax.random.fold_in(key, self.global_step)
            )
            return metrics
        # K steps in one dispatch: stacked batches [K, rays, ...] sharded on
        # the ray axis; the scan folds per-step keys from the carried step
        # counter, so the draws match the single-step loop exactly.
        scan_fn = self._scan_steps.get((warmup, n_steps))
        if scan_fn is None:
            scan_fn = make_train_step_scan(
                self.config,
                self.camera,
                self.buffers,
                self.optimizer,
                n_steps=n_steps,
                geometry_warmup=warmup,
                mesh=self.mesh,
            )
            self._scan_steps[(warmup, n_steps)] = scan_fn
        batches = [self.data_manager.next_train_batch() for _ in range(n_steps)]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        stacked = mesh_lib.shard_batch(self.mesh, stacked, batch_axis=1)
        self.state, metrics = scan_fn(self.state, stacked, key)
        return metrics

    @staticmethod
    def _crossed(prev: int, cur: int, interval: int) -> bool:
        return (cur // interval) > (prev // interval)

    def run(self) -> None:
        cfg = self.config
        intervals = cfg.intervals
        if not cfg.evaluation_only:
            last_log_t = time.time()
            last_log_step = self.global_step
            metrics = {}
            while self.global_step < cfg.model.end_iter:
                n_steps = self._next_chunk_size()
                metrics = self.train_iter(n_steps)
                prev = self.global_step
                self.global_step += n_steps
                gs = self.global_step
                if self._crossed(prev, gs, intervals.log_metrics):
                    m = {k: float(v) for k, v in metrics.items()}
                    now = time.time()
                    steps = gs - last_log_step
                    if steps > 0 and now > last_log_t:
                        m["steps_per_sec"] = steps / (now - last_log_t)
                        m["rays_per_sec"] = m["steps_per_sec"] * self.global_batch
                    last_log_t, last_log_step = now, gs
                    if self.is_main_process:
                        self.logger.log(m, gs)
                if self._crossed(prev, gs, intervals.save_ckpt):
                    self._save_ckpt()
                if self._crossed(prev, gs, intervals.render_test_views):
                    self.render_test_views()
                if self._crossed(prev, gs, intervals.dump_mesh):
                    self.dump_mesh()
                if self._crossed(prev, gs, intervals.render_video):
                    self.render_video()
            self._stop_profile()  # flush a window left open at end_iter

        self.dump_mesh(resolution=cfg.final_mesh_resolution)
        self.render_test_views(is_final=True)

    # ------------------------------------------------------------------

    def render_test_views(self, is_final: bool = False) -> dict:
        """Strided view assignment over hosts + metric mean (reference
        trainer.py:285-325; the NCCL gather_object becomes a host
        allgather)."""
        total = self.data_manager.test_view_num
        skip = 1 if is_final else self.config.data.testset_skip
        start = self.process_index * skip
        # Single host: keep params device-resident (the evaluator replicates
        # once per pytree); multihost arrays are not locally addressable for
        # the per-host eval mesh, so hop via host there.
        params = (
            self.state.params
            if self.process_count == 1
            else jax.device_get(self.state.params)
        )
        rg = self.config.ray_generator
        rg_on = rg.cam_opt_mode != "off" or rg.pl_opt
        # Pre-registration raygen tables (identical on every host — params
        # run in lockstep): the baseline for the multihost ownership merge.
        baseline_rg = (
            {k: np.asarray(v) for k, v in jax.device_get(params["raygen"]).items()}
            if rg_on and self.process_count > 1
            else None
        )

        metrics_list = []
        registered = False
        owned_rows: list = []
        for idx in range(start, total, skip * self.process_count):
            pixels = self.data_manager.get_test_view(idx)
            if rg_on and pixels.rgb_gt is not None:
                # This host registers (owns) this view's pose/light row.
                owned_rows.append(int(np.asarray(pixels.img_indices).reshape(-1)[0]))
            img_dict, metrics, tensor_dict, params = self.evaluator.get_eval_dicts(
                params, pixels
            )
            registered = True
            self._save_dumps(idx, img_dict, tensor_dict)
            if idx == 0 and self.is_main_process:
                for k, v in img_dict.items():
                    img = v * 0.5 + 0.5 if "normal" in k else v
                    self.logger.log_image(k, img, self.global_step)
            metrics_list.append(metrics)

        # The reference's register_view mutates the live ray generator, so
        # test-time registered pose/light rows persist into the training
        # state (test-image rows are never sampled by training,
        # base_pipeline.py:71-91).  Single host: fold the updated tables
        # straight back.  Multihost: hosts register DISJOINT views (strided
        # assignment => each per-image row is touched by at most one host),
        # so an allgather + ownership merge reproduces single-host
        # semantics exactly — every host folds in every other host's
        # registered rows and the tables stay in lockstep.
        if registered and self.process_count == 1 and rg_on:
            new_params = dict(self.state.params)
            new_params["raygen"] = mesh_lib.replicate(self.mesh, params["raygen"])
            self.state = self.state.replace(params=new_params)
        elif rg_on and self.process_count > 1:
            # All hosts enter (collective), including hosts that rendered
            # zero views this round (their deltas are zero).
            merged = self._merge_registered_raygen(
                baseline_rg, jax.device_get(params["raygen"]), owned_rows
            )
            new_params = dict(self.state.params)
            new_params["raygen"] = mesh_lib.replicate(self.mesh, merged)
            self.state = self.state.replace(params=new_params)

        if self.process_count > 1:
            from jax.experimental import multihost_utils

            # process_allgather requires the SAME shape on every host; hosts
            # render unequal view counts when skip*P doesn't divide total,
            # so pad to the common maximum (NaN rows are dropped on decode).
            n_rows = -(-total // (skip * self.process_count))
            gathered = multihost_utils.process_allgather(
                _metrics_to_array(metrics_list, n_rows)
            )
            all_metrics = _array_to_metrics(gathered)
        else:
            all_metrics = [m for m in metrics_list if m]

        means: dict = {}
        if all_metrics:
            keys = all_metrics[0].keys()
            means = {
                f"val/{k}": float(np.mean([m[k] for m in all_metrics])) for k in keys
            }
            if self.is_main_process:
                self.logger.log(means, self.global_step)
        return means

    @staticmethod
    def _merge_registered_raygen(
        baseline: dict, updated: dict, owned_rows: list
    ) -> dict:
        """Ownership merge of per-image raygen tables across hosts.

        Each host contributes ``updated - baseline`` masked to the rows of
        the views IT registered this round; summing the allgathered deltas
        onto the shared baseline reconstructs the table every host would
        hold had it registered all views itself (rows are disjoint under
        the strided view assignment, so the sum never mixes two hosts'
        updates to one row).  Restores the reference's in-place persistence
        semantics (base_pipeline.py:71-91) on multihost.
        """
        from jax.experimental import multihost_utils

        merged = {}
        for k in sorted(baseline):  # deterministic collective order
            base = np.asarray(baseline[k])
            upd = np.asarray(updated[k])
            mask = np.zeros((base.shape[0],) + (1,) * (base.ndim - 1), base.dtype)
            if owned_rows:
                mask[np.asarray(owned_rows)] = 1.0
            all_delta = np.asarray(
                multihost_utils.process_allgather((upd - base) * mask)
            )
            merged[k] = base + all_delta.sum(axis=0)
        return merged

    def _save_dumps(self, view_idx: int, img_dict: dict, tensor_dict: dict) -> None:
        import imageio.v3 as iio

        dump_dir = self.log_dir / "test_views" / f"step_{self.global_step:07d}"
        dump_dir.mkdir(parents=True, exist_ok=True)
        for k, v in img_dict.items():
            if "normal" in k:
                v = v * 0.5 + 0.5
            if v.shape[-1] == 1:
                v = v[..., 0]
            iio.imwrite(
                dump_dir / f"{k}_{view_idx:03d}.png",
                (np.clip(v * 255, 0, 255)).astype(np.uint8),
            )
        for k, v in tensor_dict.items():
            np.save(dump_dir / f"{k}_{view_idx:03d}.npy", v)

    # ------------------------------------------------------------------

    def dump_mesh(self, resolution: int = 256) -> Optional[pathlib.Path]:
        """SDF grid on device, marching cubes on host (native extension),
        OBJ to disk (reference trainer.py:365-380)."""
        if not self.is_main_process:
            return None
        mesh_dir = self.log_dir / "mesh"
        mesh_dir.mkdir(parents=True, exist_ok=True)
        params = jax.device_get(self.state.params)
        grid = np.asarray(
            extract_sdf_grid(
                params["renderer"],
                self.config.model,
                [-1.01, -1.01, -1.01],
                [1.01, 1.01, 1.01],
                resolution,
            )
        )
        out_path = mesh_dir / f"step_{self.global_step:07d}_res_{resolution}.obj"
        try:
            from nrhints_tpu.eval.mesh_export import marching_cubes_to_obj

            marching_cubes_to_obj(
                grid, 0.0, [-1.01] * 3, [1.01] * 3, out_path
            )
            return out_path
        except Exception as e:  # native ext missing — keep the raw field
            npy_path = mesh_dir / f"step_{self.global_step:07d}_res_{resolution}_sdfgrid.npy"
            np.save(npy_path, grid)
            print(f"marching cubes unavailable ({e!r}); dumped SDF grid to {npy_path}")
            return npy_path

    # ------------------------------------------------------------------

    def render_video(self) -> None:
        """Frame-strided video rendering over hosts; the main process
        collects every frame and encodes the two clips (reference
        trainer.py:382-421).  The reference relayed frames rank->rank0 over
        NCCL P2P; here non-main hosts ship each frame through a
        ``process_allgather`` hop, so NO shared filesystem is assumed —
        only the main process touches the run dir."""
        video_dir = self.log_dir / "video"
        frame_dir = video_dir / f"step_{self.global_step:07d}"
        if self.is_main_process:
            frame_dir.mkdir(parents=True, exist_ok=True)
        bundles = self.data_manager.get_video_pixel_bundles(
            self.config.data.video_frame_num, is_z_up=self.config.data.is_z_up
        )
        params = (
            self.state.params
            if self.process_count == 1
            else jax.device_get(self.state.params)
        )
        import imageio.v3 as iio

        n, H, W = bundles.shape
        frames_per = -(-n // self.process_count)

        # Pipelined: dispatch frame i+1's render before finalizing frame
        # i, so i's device->host transfer overlaps i+1's device render
        # (evaluator.render_image_async; ~2x over a remote device link).
        def _dispatch(i: int):
            idx = i + frames_per * self.process_index
            if idx < n:
                return idx, self.evaluator.render_image_async(params, bundles[idx])
            return idx, None  # every host must still feed the collective

        pending = _dispatch(0)
        for i in range(frames_per):
            idx, fin = pending
            if i + 1 < frames_per:
                pending = _dispatch(i + 1)
            if fin is not None:
                rgb = (np.clip(fin()["rgb"] * 255, 0, 255)).astype(np.uint8)
            else:
                rgb = np.zeros((H, W, 3), np.uint8)
            if self.process_count > 1:
                from jax.experimental import multihost_utils

                gathered = np.asarray(multihost_utils.process_allgather(rgb))
                if self.is_main_process:
                    for p in range(self.process_count):
                        fidx = i + frames_per * p
                        if fidx < n:
                            iio.imwrite(frame_dir / f"{fidx:03d}.png", gathered[p])
            elif idx < n:
                iio.imwrite(frame_dir / f"{idx:03d}.png", rgb)

        if self.is_main_process:
            self._encode_videos(frame_dir, video_dir, n)

    def _encode_videos(self, frame_dir, video_dir, n_frames: int) -> None:
        import imageio.v3 as iio

        frames = []
        for idx in range(n_frames):
            p = frame_dir / f"{idx:03d}.png"
            if not p.exists():
                print(f"video frame {idx} missing; skipping mp4 encode")
                return
            frames.append(iio.imread(p))
        video = np.stack(frames)
        half = self.config.data.video_frame_num
        try:
            iio.imwrite(
                video_dir / f"step_{self.global_step:06d}_rot_view.mp4",
                video[:half],
                fps=30,
            )
            iio.imwrite(
                video_dir / f"step_{self.global_step:06d}_rot_light.mp4",
                video[half:],
                fps=30,
            )
        except Exception as e:
            print(f"mp4 encode unavailable ({e!r}); PNG frames kept in {frame_dir}")


def _metrics_to_array(metrics_list, n_rows=None):
    """Fixed-key metric dicts -> [n_rows, k] array for allgather; rows are
    NaN-padded to the same shape on every host."""
    keys = ("psnr", "ssim", "lpips")
    if n_rows is None:
        n_rows = len(metrics_list)
    arr = np.full((max(n_rows, 1), len(keys)), np.nan, dtype=np.float32)
    for i, m in enumerate(metrics_list):
        for j, k in enumerate(keys):
            if k in m:
                arr[i, j] = m[k]
    return arr


def _array_to_metrics(arr):
    keys = ("psnr", "ssim", "lpips")
    arr = np.asarray(arr).reshape(-1, len(keys))
    out = []
    for row in arr:
        m = {k: float(v) for k, v in zip(keys, row) if np.isfinite(v)}
        if m:
            out.append(m)
    return out


def launch(config: SystemConfig) -> Trainer:
    """Build a trainer and run it (the reference launch() without the
    subprocess fan-out — multi-chip is the mesh's job, multi-host is one
    process per host started by the cluster runtime)."""
    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    trainer = Trainer(config)
    trainer.run()
    return trainer
