"""Quality check for the fused bf16 core kernels: train the FULL flagship
model (8x256 SDF, 64+64 samples, both hints) on a synthetic sphere scene for
a few thousand steps with the production default (fused Pallas core, bf16
dot operands) vs the XLA path, and compare final eval PSNR.

Usage: python scripts/quality_bf16.py [steps] [out_dir]
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.configs.config import IntervalsConfig, SystemConfig
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.train.trainer import Trainer
from tests.data_utils import make_synthetic_scene


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else pathlib.Path(
        tempfile.mkdtemp(prefix="bf16_quality_")
    )
    scene_dir = out / "scene"
    if not (scene_dir / "transforms_train.json").exists():
        make_synthetic_scene(scene_dir, n_train=30, n_val=2, n_test=3, H=128, W=128)
    scene = parse_load_nr_data(scene_dir)

    results = {}
    for mode in ("fused", "xla"):
        cfg = SystemConfig(
            base_dir=str(out / "runs"),
            exp_name=f"q_{mode}",
            scene_name="sphere",
            intervals=IntervalsConfig(
                log_metrics=200,
                save_ckpt=10_000_000,
                render_test_views=10_000_000,
                render_video=10_000_000,
                dump_mesh=10_000_000,
            ),
        )
        m = cfg.model
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                m,
                end_iter=steps,
                warm_up_end=min(500, steps // 4),
                anneal_end=steps,
                renderer=dataclasses.replace(
                    m.renderer, fused_kernels="auto" if mode == "fused" else "off"
                ),
            ),
        )
        trainer = Trainer(cfg, scene=scene)
        trainer.run()
        lines = [
            json.loads(l)
            for l in (trainer.log_dir / "metrics.jsonl").read_text().splitlines()
        ]
        val = [l for l in lines if "val/psnr" in l]
        tr = [l for l in lines if "loss" in l]
        results[mode] = {
            "final_val_psnr": val[-1]["val/psnr"] if val else None,
            "final_train_loss": tr[-1]["loss"] if tr else None,
            "rays_per_sec": tr[-1].get("rays_per_sec") if tr else None,
        }
        print(mode, results[mode], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
