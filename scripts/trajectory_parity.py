"""Training-trajectory parity: the live PyTorch reference vs nrhints_tpu,
head-to-head on the procedural hints scene.

Both sides get IDENTICAL initial weights (torch init converted via
tests/torch_ref.renderer_torch_to_params — the same converter the forward/
gradient parity suite uses), IDENTICAL per-step pixel batches (one numpy
sampler stream feeds both), and IDENTICAL optimizer/schedule (Adam 5e-4,
warmup+cosine lr_lambda — reference trainer/trainer.py:99-113, train_iter
trainer/trainer.py:269-283, loss pipelines/base_pipeline.py:50-69).

What CANNOT be identical: the per-step stratified/importance sample jitter
(torch.rand vs jax.random are different RNGs).  Individual steps therefore
differ by sampling noise, and the comparison is between TRAJECTORIES — the
smoothed loss curve and eval PSNR at checkpoints — which is exactly the
"training dynamics" claim under test.  The tolerance is calibrated against
the run-to-run spread of the reference ITSELF under a different torch seed
(same batches, same init): our curve must sit within the same band.

Usage:
    python scripts/trajectory_parity.py --steps 2000 --out PARITY_traj.json

Outputs one JSON document with both curves (and the torch-reseeded control
curve), checkpoint eval PSNRs, and the summary deltas; prints a markdown
table suitable for PARITY.md.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Reduced sampling schedule (the VERDICT-suggested CPU-sized config): 16
# stratified + 2x8 importance, shadow 16+16.  Both sides get it verbatim.
SAMP = dict(
    n_samples=16,
    n_importance_samples=16,
    up_sample_steps=2,
    n_shadow_samples=16,
    n_shadow_importance_samples=16,
)

# The flagship sampling geometry (the shipping RendererConfig defaults):
# VERDICT r4 Next #4(i) — trajectory parity at 64+4x16 / shadow 64+64.
SAMP_FLAGSHIP = dict(
    n_samples=64,
    n_importance_samples=64,
    up_sample_steps=4,
    n_shadow_samples=64,
    n_shadow_importance_samples=64,
)

# Ray-generator kwargs shared VERBATIM by both sides (empty = both
# defaults).  --cam-opt sets the nr-hints-cam-opt regime: learned SO3xR3
# pose + pl deltas (two Adam LR groups) against synthetic pose/pl noise —
# the same values the forward parity test pins
# (tests/test_parity_torch.py::test_ray_generator_parity; reference
# camera/ray_generator.py:100-126).
RAYGEN: dict = {}
CAM_OPT_KW = dict(
    cam_opt_mode="SO3xR3",
    pl_opt=True,
    cam_position_noise_std=0.02,
    cam_orientation_noise_std=0.01,
    pl_position_noise_std=0.05,
)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-10)


def _smooth(xs, window):
    xs = np.asarray(xs, np.float64)
    if len(xs) < window:
        return xs.copy()
    kernel = np.ones(window) / window
    return np.convolve(xs, kernel, mode="valid")


def build_scene(scene_dir, H, W, n_train):
    from nrhints_tpu.data.parser import parse_load_nr_data
    from nrhints_tpu.data.synthetic import make_hints_scene

    scene_dir = pathlib.Path(scene_dir)
    if not (scene_dir / "transforms_train.json").exists():
        make_hints_scene(scene_dir, n_train=n_train, n_val=1, n_test=2, H=H, W=W, seed=0)
    return parse_load_nr_data(scene_dir, white_background=True)


def _torch_pipeline(scene, samp, hyper, torch_seed):
    """Instantiate the reference pipeline + Adam + LambdaLR on CPU."""
    import types

    import torch

    from tests.torch_ref import import_reference_pipeline

    PIPE = import_reference_pipeline()

    # torch_ref stubs torchmetrics with a raiser (the eval-parity tests never
    # touch metrics); the TRAIN loss dict calls PSNR every step
    # (pipelines/base_pipeline.py:68), so give the reference a real one.
    def _torch_psnr(rgb, rgb_gt):
        mse = torch.mean((rgb - rgb_gt) ** 2)
        return -10.0 * torch.log10(mse + 1e-10)

    PIPE.base_pipeline.PSNR = _torch_psnr
    from camera.ray_generator import RayGeneratorConfig as RefRayGenConfig
    from models.neus_hint_model import NeuSModelConfig, NeuSRendererConfig

    torch.manual_seed(torch_seed)
    cam = scene.camera
    ref_cam = PIPE.camera_model.CameraModel(
        H=cam.H, W=cam.W, cx=cam.cx, cy=cam.cy, fx=cam.fx, fy=cam.fy, zn=cam.zn, zf=cam.zf
    )
    model_cfg = NeuSModelConfig(renderer=NeuSRendererConfig(**samp), **hyper)
    pipe = PIPE.base_pipeline.BaseNRHintPipeline(
        config=types.SimpleNamespace(
            model=model_cfg,
            ray_generator=RefRayGenConfig(**RAYGEN),
            data=types.SimpleNamespace(white_background=True),
        ),
        shm_info=types.SimpleNamespace(camera=ref_cam, total_image_num=scene.total_image_num),
    )
    optimizer = torch.optim.Adam(pipe.get_param_groups())

    warm_up_end = model_cfg.warm_up_end
    end_iter = model_cfg.end_iter
    alpha = model_cfg.lr_alpha

    def lr_lambda(iter_step):  # trainer/trainer.py:105-111 verbatim semantics
        if iter_step < warm_up_end:
            return iter_step / warm_up_end
        progress = (iter_step - warm_up_end) / (end_iter - warm_up_end)
        return (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha

    scheduler = torch.optim.lr_scheduler.LambdaLR(optimizer, lr_lambda)
    return pipe, optimizer, scheduler, PIPE


def _torch_bundle(batch):
    """Our numpy PixelBundle -> the reference's RawPixelBundle (train shapes:
    reference data/data_loader.py:180-191)."""
    import torch

    from data.data_loader import RawPixelBundle  # reference module

    return RawPixelBundle(
        img_indices=torch.from_numpy(np.asarray(batch.img_indices, np.int64))[..., None],
        h_indices=torch.from_numpy(np.asarray(batch.h_indices, np.float32))[..., None],
        w_indices=torch.from_numpy(np.asarray(batch.w_indices, np.float32))[..., None],
        rgb_gt=torch.from_numpy(np.asarray(batch.rgb_gt, np.float32)),
        poses=torch.from_numpy(np.asarray(batch.poses, np.float32)),
        pls=torch.from_numpy(np.asarray(batch.pls, np.float32)),
    )


def _torch_whole_image(pipe, bundle_np):
    """Whole-image reference render -> rgb image (rgb_gt withheld so the
    stubbed torchmetrics are never touched)."""
    import torch

    from data.data_loader import RawPixelBundle

    H, W = bundle_np.h_indices.shape
    ref_bundle = RawPixelBundle(
        img_indices=torch.from_numpy(np.asarray(bundle_np.img_indices, np.int64))[..., None],
        h_indices=torch.from_numpy(np.asarray(bundle_np.h_indices, np.float32))[..., None],
        w_indices=torch.from_numpy(np.asarray(bundle_np.w_indices, np.float32))[..., None],
        rgb_gt=None,
        poses=torch.from_numpy(np.asarray(bundle_np.poses, np.float32)),
        pls=torch.from_numpy(np.asarray(bundle_np.pls, np.float32)),
    )
    with torch.no_grad():
        img, _, _ = pipe.get_eval_dicts(ref_bundle, torch.device("cpu"))
    return np.asarray(img["rgb"], np.float32)


def run_torch_side(scene, batches, hyper, eval_steps, eval_bundle, torch_seed=3,
                   pipe=None, optimizer=None, scheduler=None):
    """Train the reference for len(batches) steps; returns curves dict.
    Pass a pre-built (pipe, optimizer, scheduler) so the caller can snapshot
    the INIT weights before training mutates them."""
    if pipe is None:
        pipe, optimizer, scheduler, _ = _torch_pipeline(scene, SAMP, hyper, torch_seed)
    losses, psnrs, evals = [], [], {}
    t0 = time.time()
    for step, batch in enumerate(batches):
        bundle = _torch_bundle(batch)
        res = pipe.forward(bundle, global_step=step)
        loss_dict = pipe.get_train_loss_dict(res, bundle)
        optimizer.zero_grad()
        loss_dict["loss"].backward()
        optimizer.step()
        scheduler.step()
        losses.append(float(loss_dict["loss"].detach()))
        psnrs.append(
            psnr(res.rgb.detach().numpy(), np.asarray(batch.rgb_gt, np.float32))
        )
        if (step + 1) in eval_steps:
            img = _torch_whole_image(pipe, eval_bundle)
            evals[step + 1] = psnr(img, eval_bundle.rgb_gt)
    return {
        "loss": losses,
        "train_psnr": psnrs,
        "eval_psnr": evals,
        "params": pipe,  # handed back so the jax side can copy the init
        "wall_s": time.time() - t0,
    }


def make_jax_cfg(hyper):
    from nrhints_tpu.camera.rays import RayGeneratorConfig
    from nrhints_tpu.configs.config import SystemConfig
    from nrhints_tpu.data.manager import DataManagerConfig
    from nrhints_tpu.render.renderer import ModelConfig, RendererConfig

    return SystemConfig(
        model=ModelConfig(renderer=RendererConfig(**SAMP), **hyper),
        ray_generator=RayGeneratorConfig(**RAYGEN),
        data=DataManagerConfig(white_background=True),
    )


def run_jax_side(scene, batches, hyper, eval_steps, eval_bundle, init_renderer_params,
                 jax_seed=0, noise_buffers=None):
    """Train nrhints_tpu from ``init_renderer_params`` (the torch pipeline's
    INIT weights, converted BEFORE the torch side trained — converting after
    would hand our run the reference's final weights).  ``noise_buffers``:
    the torch side's drawn cam/pl noise, copied verbatim so both sides fight
    the SAME synthetic miscalibration (cam-opt runs)."""
    import jax
    import jax.numpy as jnp

    from nrhints_tpu.camera.rays import ray_generator_init
    from nrhints_tpu.core.structs import PixelBundle
    from nrhints_tpu.eval.evaluator import Evaluator
    from nrhints_tpu.train.step import init_train_state, make_optimizer, make_train_step

    cfg = make_jax_cfg(hyper)
    key = jax.random.PRNGKey(jax_seed)
    raygen_params, buffers = ray_generator_init(
        jax.random.PRNGKey(0), cfg.ray_generator, scene.total_image_num
    )
    if noise_buffers:
        for k, v in noise_buffers.items():
            assert k in buffers, k
            buffers[k] = jnp.asarray(v)
    params = {
        "renderer": jax.tree_util.tree_map(jnp.asarray, init_renderer_params),
        "raygen": raygen_params,
    }
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, scene.camera, buffers, optimizer, donate=False)
    evaluator = Evaluator(cfg, scene.camera, buffers, mesh=None)

    losses, psnrs, evals = [], [], {}
    t0 = time.time()
    for step, batch in enumerate(batches):
        dev_batch = PixelBundle(
            h_indices=jnp.asarray(batch.h_indices),
            w_indices=jnp.asarray(batch.w_indices),
            poses=jnp.asarray(batch.poses),
            pls=jnp.asarray(batch.pls),
            img_indices=jnp.asarray(batch.img_indices),
            rgb_gt=jnp.asarray(batch.rgb_gt),
        )
        state, metrics = step_fn(state, dev_batch, jax.random.fold_in(key, step))
        losses.append(float(metrics["loss"]))
        psnrs.append(float(metrics["psnr"]))
        if (step + 1) in eval_steps:
            res = evaluator.render_image(state.params, eval_bundle)
            evals[step + 1] = psnr(np.asarray(res["rgb"]), eval_bundle.rgb_gt)
    return {
        "loss": losses,
        "train_psnr": psnrs,
        "eval_psnr": evals,
        "wall_s": time.time() - t0,
    }


def run_head_to_head(
    steps: int,
    batch_size: int = 128,
    H: int = 64,
    W: int = 64,
    n_train: int = 12,
    n_evals: int = 4,
    smooth_window: int = 100,
    scene_dir=None,
    with_control: bool = True,
    samp: dict | None = None,
    raygen: dict | None = None,
):
    """Full experiment; returns the results dict (see __main__ for schema)."""
    import tempfile

    # The jax side runs on host CPU (the torch reference is CPU-only in this
    # image; a fair head-to-head keeps both local).  The container's
    # sitecustomize pins the remote TPU backend regardless of JAX_PLATFORMS,
    # so override the config the way tests/conftest.py does.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nrhints_tpu.data.manager import DataManager

    global SAMP, RAYGEN
    if samp is not None:
        SAMP = dict(samp)  # module-global: _torch_pipeline and make_jax_cfg read it
    if raygen is not None:
        RAYGEN = dict(raygen)

    if scene_dir is None:
        scene_dir = pathlib.Path(tempfile.gettempdir()) / f"nrhints_traj_{H}x{W}_{n_train}"
    scene = build_scene(scene_dir, H, W, n_train)

    # One shared batch stream: our sampler (rank-0 discipline), materialized
    # up front so both frameworks consume byte-identical batches.
    dm = DataManager(scene, batch_size=batch_size, image_idx_rng_seed=3407, pixel_idx_rng_seed=3407)
    batches = [dm.next_train_batch() for _ in range(steps)]

    # Schedule: no warmup (VERDICT r3 #2's suggested regime), cosine over the
    # run, anneal over the first half.
    hyper = dict(
        warm_up_end=0,
        end_iter=steps,
        anneal_end=max(1, steps // 2),
        geometry_warmup_end=0,
    )

    n_evals = max(1, n_evals)
    eval_steps = sorted({int(steps * (i + 1) / n_evals) for i in range(n_evals)})
    eval_bundle = dm.get_view(scene.num_image_per_split[0])  # first val view

    # Build the torch pipeline and snapshot its INIT weights FIRST — the
    # torch side trains in place, and converting afterwards would start the
    # jax run from the reference's FINAL weights (the round-4 calibration
    # bug: "ours" looked 43% better on train loss because it was).
    import numpy as _np

    from tests.torch_ref import renderer_torch_to_params

    pipe, optimizer, scheduler, _ = _torch_pipeline(scene, SAMP, hyper, torch_seed=3)
    init_renderer_params = jax.tree_util.tree_map(
        _np.copy, renderer_torch_to_params(pipe.renderer)
    )
    # Snapshot the torch-drawn synthetic noise too (learned deltas init at
    # zero on both sides; the NOISE is an rng draw that must be shared).
    noise_buffers = {}
    rg = pipe.ray_generator
    for attr in ("cam_pose_noise", "pl_noise"):
        if hasattr(rg, attr):
            noise_buffers[attr] = _np.copy(getattr(rg, attr).detach().numpy())

    ref = run_torch_side(
        scene, batches, hyper, eval_steps, eval_bundle,
        pipe=pipe, optimizer=optimizer, scheduler=scheduler,
    )
    ref.pop("params")
    ours = run_jax_side(
        scene, batches, hyper, eval_steps, eval_bundle, init_renderer_params,
        noise_buffers=noise_buffers,
    )

    control = None
    if with_control:
        # The tolerance yardstick: the reference vs ITSELF under a different
        # torch sampling seed but the same init weights.  Re-seeding after
        # construction would change the init, so rebuild and copy weights.
        import torch

        ctrl_pipe, opt2, sch2, _ = _torch_pipeline(scene, SAMP, hyper, torch_seed=3)
        torch.manual_seed(1234)  # decorrelate the per-step sample jitter only
        ctrl = {"loss": [], "train_psnr": [], "eval_psnr": {}}
        for step, batch in enumerate(batches):
            bundle = _torch_bundle(batch)
            res = ctrl_pipe.forward(bundle, global_step=step)
            loss_dict = ctrl_pipe.get_train_loss_dict(res, bundle)
            opt2.zero_grad()
            loss_dict["loss"].backward()
            opt2.step()
            sch2.step()
            ctrl["loss"].append(float(loss_dict["loss"].detach()))
            ctrl["train_psnr"].append(
                psnr(res.rgb.detach().numpy(), np.asarray(batch.rgb_gt, np.float32))
            )
            if (step + 1) in eval_steps:
                img = _torch_whole_image(ctrl_pipe, eval_bundle)
                ctrl["eval_psnr"][step + 1] = psnr(img, eval_bundle.rgb_gt)
        control = ctrl

    w = min(smooth_window, max(1, steps // 4))
    ref_s, ours_s = _smooth(ref["loss"], w), _smooth(ours["loss"], w)
    ref_p, ours_p = _smooth(ref["train_psnr"], w), _smooth(ours["train_psnr"], w)
    summary = {
        "steps": steps,
        "batch_size": batch_size,
        "smooth_window": w,
        "max_abs_smoothed_loss_diff": float(np.max(np.abs(ref_s - ours_s))),
        "max_rel_smoothed_loss_diff": float(
            np.max(np.abs(ref_s - ours_s) / np.maximum(ref_s, 1e-8))
        ),
        "max_abs_smoothed_psnr_diff": float(np.max(np.abs(ref_p - ours_p))),
        "final_eval_psnr_ref": ref["eval_psnr"][eval_steps[-1]],
        "final_eval_psnr_ours": ours["eval_psnr"][eval_steps[-1]],
        "eval_psnr_diffs": {
            str(s): ours["eval_psnr"][s] - ref["eval_psnr"][s] for s in eval_steps
        },
    }
    if control is not None:
        ctrl_s = _smooth(control["loss"], w)
        ctrl_p = _smooth(control["train_psnr"], w)
        summary["control_max_abs_smoothed_loss_diff"] = float(
            np.max(np.abs(ref_s - ctrl_s))
        )
        summary["control_max_abs_smoothed_psnr_diff"] = float(
            np.max(np.abs(ref_p - ctrl_p))
        )
        summary["control_eval_psnr_diffs"] = {
            str(s): control["eval_psnr"][s] - ref["eval_psnr"][s] for s in eval_steps
        }
    return {
        "summary": summary,
        "eval_steps": eval_steps,
        "ref": {k: ref[k] for k in ("loss", "train_psnr", "eval_psnr", "wall_s")},
        "ours": ours,
        "control": control,
    }


def markdown_table(res) -> str:
    """Checkpoint table for PARITY.md."""
    s = res["summary"]
    lines = [
        "| step | ref loss (sm) | ours loss (sm) | ref train PSNR (sm) | ours | ref eval PSNR | ours | ctrl eval PSNR |",
        "|---|---|---|---|---|---|---|---|",
    ]
    w = s["smooth_window"]
    ref_s = _smooth(res["ref"]["loss"], w)
    ours_s = _smooth(res["ours"]["loss"], w)
    ref_p = _smooth(res["ref"]["train_psnr"], w)
    ours_p = _smooth(res["ours"]["train_psnr"], w)
    for step in res["eval_steps"]:
        i = max(0, min(step - w, len(ref_s) - 1))
        ctrl = (
            f"{res['control']['eval_psnr'][step]:.2f}"
            if res.get("control")
            else "—"
        )
        lines.append(
            f"| {step} | {ref_s[i]:.4f} | {ours_s[i]:.4f} | {ref_p[i]:.2f} | "
            f"{ours_p[i]:.2f} | {res['ref']['eval_psnr'][step]:.2f} | "
            f"{res['ours']['eval_psnr'][step]:.2f} | {ctrl} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=64, help="image H=W")
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--evals", type=int, default=4)
    ap.add_argument("--no-control", action="store_true")
    ap.add_argument("--scene-dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--samp", choices=["reduced", "flagship"], default="reduced",
        help="sampling geometry: reduced (16+2x8, shadow 16+16) or the "
        "flagship shipping defaults (64+4x16, shadow 64+64)",
    )
    ap.add_argument(
        "--cam-opt", action="store_true",
        help="nr-hints-cam-opt regime: SO3xR3 pose + pl deltas (second Adam "
        "group at opt_lr) against shared synthetic pose/pl noise",
    )
    args = ap.parse_args()

    res = run_head_to_head(
        steps=args.steps,
        batch_size=args.batch,
        H=args.size,
        W=args.size,
        n_train=args.views,
        n_evals=args.evals,
        scene_dir=args.scene_dir,
        with_control=not args.no_control,
        samp=SAMP_FLAGSHIP if args.samp == "flagship" else None,
        raygen=CAM_OPT_KW if args.cam_opt else None,
    )
    print(markdown_table(res))
    print(json.dumps(res["summary"], indent=2))
    if args.out:
        slim = dict(res)
        slim["control"] = res["control"] and {
            k: res["control"][k] for k in ("loss", "train_psnr", "eval_psnr")
        }
        pathlib.Path(args.out).write_text(json.dumps(slim))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
