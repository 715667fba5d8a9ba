"""Pose-registration QUALITY test: register_view must not just move
parameters, it must recover a perturbed pose (round-1 verdict item 3b).

Why this shape: training-time *absolute* pose recovery (perturb all poses
via the noise buffers, train with SE3 opt, expect the adjustment table to
invert the noise) is not identifiable at test scale — measured here, the
per-image residual grows to a plateau while train PSNR climbs past 40,
because the model absorbs per-view pose error into geometry/appearance
(global gauge freedom + few views; the reference's synthetic experiments
rely on hundreds of views and 1M steps).  What IS identifiable is
registration against FIXED geometry: train on clean poses, perturb one
view's pose by a known SE3 delta, run register_view, and require it to
(a) win back most of the PSNR the perturbation cost and (b) strictly
shrink the pose residual toward the inverse delta.  This is exactly the
reference's test-time registration use case (base_pipeline.py:71-91).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrhints_tpu.camera.rays import RayGeneratorConfig
from nrhints_tpu.configs.config import IntervalsConfig, ParallelConfig, SystemConfig
from nrhints_tpu.core.lie import exp_map_SE3
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.eval.metrics import psnr
from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
from nrhints_tpu.fields.sdf import SDFNetConfig
from nrhints_tpu.render.renderer import ModelConfig, RendererConfig
from nrhints_tpu.train.trainer import Trainer
from tests.data_utils import make_synthetic_scene

# Known SE3 perturbation (translation xyz, rotation xyz tangent) applied to
# the evaluated view — costs ~4.6 dB at the trained quality below.
NOISE_TANGENT = np.array([0.075, -0.05, 0.05, 0.030, -0.020, 0.025], np.float32)


def _apply_delta(D: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Left-apply an [3,4] delta exactly as generate_rays does
    (R <- dR R, t <- dt + dR t)."""
    out = pose.copy()
    out[:3, :3] = D[:3, :3] @ pose[:3, :3]
    out[:3, 3] = D[:3, 3] + D[:3, :3] @ pose[:3, 3]
    return out


def _residual(adjust_row: np.ndarray, D_noise: np.ndarray) -> float:
    """|| D_learn @ D_noise - I ||: zero iff the learned row inverts the
    perturbation."""
    D_learn = np.asarray(exp_map_SE3(jnp.asarray(adjust_row[None])))[0]
    r = D_learn[:3, :3] @ D_noise[:3, :3]
    t = D_learn[:3, 3] + D_learn[:3, :3] @ D_noise[:3, 3]
    return float(np.linalg.norm(r - np.eye(3)) + np.linalg.norm(t))


@pytest.mark.slow
def test_register_view_recovers_perturbed_pose(tmp_path):
    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene", n_train=10))
    cfg = SystemConfig(
        model=ModelConfig(
            sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
            reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
            renderer=RendererConfig(
                n_samples=8,
                n_importance_samples=8,
                n_shadow_samples=8,
                n_shadow_importance_samples=8,
            ),
            batch_size=64,
            inference_chunk_size=256,
            warm_up_end=20,
            end_iter=2500,
            anneal_end=100,
        ),
        ray_generator=RayGeneratorConfig(cam_opt_mode="SE3", opt_lr=2e-4),
        intervals=IntervalsConfig(
            log_metrics=10_000_000,
            save_ckpt=10_000_000,
            render_test_views=10_000_000,
            render_video=10_000_000,
            dump_mesh=10_000_000,
        ),
        parallel=ParallelConfig(steps_per_dispatch=25),
        base_dir=str(tmp_path),
        exp_name="reg_quality",
        scene_name="sphere",
    )
    trainer = Trainer(cfg, scene=scene)
    while trainer.global_step < cfg.model.end_iter:
        n = trainer._next_chunk_size()
        trainer.train_iter(n)
        trainer.global_step += n

    params = jax.device_get(trainer.state.params)
    pixels = trainer.data_manager.get_test_view(0)
    gidx = int(np.asarray(pixels.img_indices).reshape(-1)[0])
    gt = np.asarray(pixels.rgb_gt)
    psnr_clean = psnr(trainer.evaluator.render_image(params, pixels)["rgb"], gt)

    D_noise = np.asarray(exp_map_SE3(jnp.asarray(NOISE_TANGENT[None])))[0]
    pose_noised = _apply_delta(D_noise, np.asarray(pixels.poses)[0, 0])
    H, W = np.asarray(pixels.h_indices).shape[:2]
    pixels_noised = dataclasses.replace(
        pixels, poses=np.broadcast_to(pose_noised, (H, W, 4, 4)).copy()
    )

    psnr_noised = psnr(trainer.evaluator.render_image(params, pixels_noised)["rgb"], gt)
    assert psnr_noised < psnr_clean - 2.0, (
        f"perturbation should visibly hurt: clean {psnr_clean:.2f}, "
        f"noised {psnr_noised:.2f}"
    )
    err0 = _residual(params["raygen"]["cam_pose_adjustment"][gidx], D_noise)

    registered = trainer.evaluator.register_view(params, pixels_noised, steps=300)
    psnr_reg = psnr(
        trainer.evaluator.render_image(registered, pixels_noised)["rgb"], gt
    )
    err1 = _residual(
        np.asarray(registered["raygen"]["cam_pose_adjustment"])[gidx], D_noise
    )

    recovered = (psnr_reg - psnr_noised) / (psnr_clean - psnr_noised)
    assert recovered >= 0.4, (
        f"register_view should win back >=40% of the lost PSNR: clean "
        f"{psnr_clean:.2f}, noised {psnr_noised:.2f}, registered {psnr_reg:.2f}"
    )
    assert err1 < err0, (
        f"registration should move the pose toward the inverse perturbation: "
        f"residual {err0:.5f} -> {err1:.5f}"
    )
    # Only the evaluated view's row may move (no cross-view leakage).
    before = params["raygen"]["cam_pose_adjustment"]
    after = np.asarray(registered["raygen"]["cam_pose_adjustment"])
    mask = np.ones(len(after), bool)
    mask[gidx] = False
    np.testing.assert_array_equal(after[mask], np.asarray(before)[mask])
