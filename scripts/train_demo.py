"""End-to-end quality demonstration on the live backend: generate the
procedural hints scene (glossy sphere casting a moving shadow on a matte
disc — both hints load-bearing), train the flagship nr-hints config for a
reduced schedule, then run the full final-eval tail (test-view PSNR/SSIM,
mesh export, turntable videos).

Everything runs through the real CLI config + Trainer path, so this also
exercises checkpointing, metrics logging, and interval hooks exactly as a
user run would.

    python scripts/train_demo.py --steps 50000 --size 128 --views 100
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--size", type=int, default=128, help="image H=W")
    ap.add_argument("--views", type=int, default=100, help="training views")
    ap.add_argument("--out", type=str, default="outputs")
    ap.add_argument("--exp", type=str, default="demo")
    ap.add_argument("--mesh-res", type=int, default=256)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--anneal", type=int, default=5_000)
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument(
        "--preset",
        type=str,
        default="nr-hints",
        help="config preset (nr-hints | pl-naive | nr-hints-cam-opt) — "
        "pl-naive is the no-hints ablation",
    )
    ap.add_argument(
        "--sdf-encoding",
        type=str,
        default="frequency",
        help='SDF position encoding ("frequency" | "hash")',
    )
    args = ap.parse_args()

    from nrhints_tpu.configs.config import PRESETS
    from nrhints_tpu.data.synthetic import make_hints_scene
    from nrhints_tpu.train.trainer import launch
    from nrhints_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    scene_dir = pathlib.Path(args.out) / args.exp / "scene_data"
    if not (scene_dir / "transforms_train.json").exists():
        print(f"generating procedural scene -> {scene_dir}", flush=True)
        make_hints_scene(
            scene_dir, n_train=args.views, n_val=5, n_test=10, H=args.size, W=args.size
        )

    cfg = PRESETS[args.preset]()
    cfg = dataclasses.replace(
        cfg,
        base_dir=args.out,
        exp_name=args.exp,
        scene_name="hints_sphere",
        data=dataclasses.replace(cfg.data, path=str(scene_dir)),
        model=dataclasses.replace(
            cfg.model,
            end_iter=args.steps,
            warm_up_end=args.warmup,
            anneal_end=args.anneal,
            sdf_network=dataclasses.replace(
                cfg.model.sdf_network, encoding=args.sdf_encoding
            ),
        ),
        intervals=dataclasses.replace(
            cfg.intervals,
            save_ckpt=max(args.steps // 4, 1),
            render_test_views=max(args.steps // 2, 1),
            dump_mesh=args.steps + 1,  # final-only
            render_video=args.steps,  # once, at the end of training
        ),
        final_mesh_resolution=args.mesh_res,
        parallel=dataclasses.replace(
            cfg.parallel, steps_per_dispatch=args.steps_per_dispatch
        ),
    )

    trainer = launch(cfg)

    metrics_path = pathlib.Path(trainer.log_dir) / "metrics.jsonl"
    if metrics_path.exists():
        lines = metrics_path.read_text().strip().splitlines()
        vals = [json.loads(line) for line in lines]
        final_val = [v for v in vals if any(k.startswith("val/") for k in v)]
        print("FINAL METRICS:")
        if final_val:
            print(json.dumps(final_val[-1], indent=2))
        print(json.dumps(vals[-1], indent=2))


if __name__ == "__main__":
    main()
