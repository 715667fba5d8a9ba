"""Convergence-quality A/B for the stash backward: train the flagship
config on the procedural scene with core_backward=stash vs recompute
(same seed, same batches) and compare val PSNR.

The stash backward's gradients differ from recompute's by bf16-activation
rounding (~4e-3 of scale worst-leaf on hardware); this checks the
difference is training-neutral where it matters — converged quality.

    python scripts/quality_stash.py --steps 3000
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from nrhints_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from nrhints_tpu.camera.rays import ray_generator_init
from nrhints_tpu.configs.config import SystemConfig
from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.data.synthetic import make_hints_scene
from nrhints_tpu.eval.evaluator import Evaluator
from nrhints_tpu.render.renderer import init_model_params
from nrhints_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step_scan,
)


def run(scene, batches_stacked, cfg, steps, k, seed=0):
    raygen_params, buffers = ray_generator_init(
        jax.random.PRNGKey(1), cfg.ray_generator, scene.total_image_num
    )
    params = {
        "renderer": init_model_params(jax.random.PRNGKey(seed), cfg.model),
        "raygen": raygen_params,
    }
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step_scan(cfg, scene.camera, buffers, optimizer, n_steps=k)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for i, stack in enumerate(batches_stacked):
        state, metrics = step_fn(state, stack, jax.random.fold_in(key, i))
    final_loss = float(metrics["loss"])
    wall = time.time() - t0

    ev = Evaluator(cfg, scene.camera, buffers, mesh=None)
    n_train, n_val = scene.num_image_per_split[0], scene.num_image_per_split[1]
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    psnrs = []
    for v in range(n_val):
        b = dm.get_view(n_train + v)
        res = ev.render_image(state.params, b)
        mse = float(np.mean((np.asarray(res["rgb"]) - b.rgb_gt) ** 2))
        psnrs.append(-10.0 * np.log10(mse + 1e-10))
    return final_loss, float(np.mean(psnrs)), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    scene_dir = pathlib.Path("/tmp/quality_stash_scene")
    if not (scene_dir / "transforms_train.json").exists():
        make_hints_scene(scene_dir, n_train=args.views, n_val=3, n_test=3,
                         H=args.size, W=args.size)
    scene = parse_load_nr_data(scene_dir, white_background=True)

    k = 16
    n_dispatch = args.steps // k
    cfg0 = SystemConfig()
    cfg0 = dataclasses.replace(
        cfg0,
        model=dataclasses.replace(
            cfg0.model, end_iter=args.steps, warm_up_end=300, anneal_end=1000
        ),
    )
    dm = DataManager(scene, batch_size=cfg0.model.batch_size)
    stacks = []
    for _ in range(n_dispatch):
        bs = [dm.next_train_batch() for _ in range(k)]
        stacks.append(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
        )

    for backward in ("stash", "recompute"):
        cfg = dataclasses.replace(
            cfg0,
            model=dataclasses.replace(
                cfg0.model,
                renderer=dataclasses.replace(
                    cfg0.model.renderer, core_backward=backward
                ),
            ),
        )
        loss, psnr, wall = run(scene, stacks, cfg, args.steps, k, seed=args.seed)
        print(
            f"seed={args.seed} core_backward={backward:10s} final loss {loss:.5f}  "
            f"val PSNR {psnr:.2f} dB  ({wall:.0f}s train)",
            flush=True,
        )


if __name__ == "__main__":
    main()
