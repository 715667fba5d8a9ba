"""End-to-end: a few hundred tiny-scene training steps through the full
Trainer (checkpoints, eval views, mesh grid dump), then resume."""
import dataclasses
import json

import numpy as np
import pytest

from nrhints_tpu.configs.config import IntervalsConfig, SystemConfig
from nrhints_tpu.data.manager import DataManagerConfig
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.render.renderer import ModelConfig, RendererConfig
from nrhints_tpu.train.trainer import Trainer
from tests.data_utils import make_synthetic_scene


def e2e_config(base_dir, end_iter=40) -> SystemConfig:
    return SystemConfig(
        model=ModelConfig(
            sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
            reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
            renderer=RendererConfig(
                n_samples=8,
                n_importance_samples=8,
                n_shadow_samples=8,
                n_shadow_importance_samples=8,
            ),
            batch_size=32,
            inference_chunk_size=128,
            warm_up_end=5,
            end_iter=end_iter,
            anneal_end=20,
        ),
        intervals=IntervalsConfig(
            log_metrics=10,
            save_ckpt=20,
            render_test_views=10_000_000,
            render_video=10_000_000,
            dump_mesh=10_000_000,
        ),
        base_dir=str(base_dir),
        exp_name="e2e",
        scene_name="sphere",
        final_mesh_resolution=32,
    )


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = make_synthetic_scene(tmp_path_factory.mktemp("scene"))
    return parse_load_nr_data(d)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("runs")


def test_trainer_end_to_end(scene, run_dir):
    cfg = e2e_config(run_dir)
    trainer = Trainer(cfg, scene=scene)
    trainer.run()
    assert trainer.global_step == 40

    log_dir = trainer.log_dir
    assert (log_dir / "config.json").exists()
    assert (log_dir / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in (log_dir / "metrics.jsonl").read_text().splitlines()]
    train_logs = [l for l in lines if "loss" in l]
    assert train_logs and all(np.isfinite(l["loss"]) for l in train_logs)
    assert "rays_per_sec" in train_logs[-1]

    # Checkpoints at 20 and 40.
    assert trainer.ckpt_io.available_steps() == [20, 40]

    # Final eval ran on all 3 test views: dumped pngs + val metrics logged.
    val_logs = [l for l in lines if "val/psnr" in l]
    assert val_logs, "final render_test_views should log val metrics"
    dump_dir = log_dir / "test_views" / "step_0000040"
    assert (dump_dir / "rgb_000.png").exists()
    assert (dump_dir / "rgb_002.png").exists()
    assert (dump_dir / "depth_000.npy").exists()

    # Mesh hook ran (native MC or SDF-grid fallback).
    mesh_files = list((log_dir / "mesh").iterdir())
    assert mesh_files


def test_trainer_resume(scene, run_dir):
    """A fresh Trainer on the same run dir resumes from the newest ckpt."""
    cfg = e2e_config(run_dir)
    t2 = Trainer(cfg, scene=scene)
    assert t2.global_step == 40
    # And continues training to a higher end_iter.
    cfg3 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, end_iter=45)
    )
    t3 = Trainer(cfg3, scene=scene)
    assert t3.global_step == 40
    for _ in range(5):
        t3.train_iter()
        t3.global_step += 1
    assert int(t3.state.step) == 45


def test_trainer_video_render(scene, run_dir):
    cfg = e2e_config(run_dir)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, video_frame_num=2)
    )
    trainer = Trainer(cfg, scene=scene)
    trainer.render_video()
    frame_dir = trainer.log_dir / "video" / f"step_{trainer.global_step:07d}"
    pngs = sorted(frame_dir.glob("*.png"))
    assert len(pngs) == 4  # two clips x two frames
