"""Training-dynamics parity vs the live PyTorch reference (slow tier).

Trains the reference (CPU, reduced samples — trainer/trainer.py:269-283,
pipelines/base_pipeline.py:50-69) and nrhints_tpu head-to-head: identical
init weights, identical per-step batches, identical Adam/cosine schedule.
Per-step sample jitter comes from each side's own RNG, so the assertion
compares smoothed trajectories against a measured yardstick: the reference
vs ITSELF under a different torch jitter seed (the "control").  Our curve
must sit within a small multiple of that same-framework noise band.

The full-length experiment (1000 steps, full reduced-sample schedule)
lives in scripts/trajectory_parity.py and persists its table in PARITY.md;
this test runs a smaller configuration (the torch side costs ~2 s/step on
CPU) so the driver can re-run the evidence in ~25-30 min.  Override the
length with NRHINTS_TRAJ_STEPS.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from scripts.trajectory_parity import run_head_to_head

pytestmark = pytest.mark.slow

TEST_SAMP = dict(
    n_samples=16,
    n_importance_samples=8,
    up_sample_steps=1,
    n_shadow_samples=8,
    n_shadow_importance_samples=8,
)


def test_training_trajectory_matches_reference(tmp_path):
    steps = int(os.environ.get("NRHINTS_TRAJ_STEPS", "400"))
    res = run_head_to_head(
        steps=steps,
        batch_size=48,
        H=40,
        W=40,
        n_train=6,
        n_evals=2,
        smooth_window=100,
        scene_dir=tmp_path / "scene",
        with_control=True,
        samp=TEST_SAMP,
    )
    s = res["summary"]

    # Both runs must actually train: loss falls substantially.
    assert np.mean(res["ref"]["loss"][-100:]) < 0.6 * np.mean(res["ref"]["loss"][:100])
    assert np.mean(res["ours"]["loss"][-100:]) < 0.6 * np.mean(res["ours"]["loss"][:100])

    # Trajectory agreement, yardsticked by the reference's own jitter-seed
    # spread (x3 covers the two-sided comparison plus f32-order noise; the
    # absolute floors keep the test meaningful if the control band is tiny).
    ctrl_loss = s["control_max_abs_smoothed_loss_diff"]
    ctrl_psnr = s["control_max_abs_smoothed_psnr_diff"]
    assert s["max_abs_smoothed_loss_diff"] <= max(0.02, 3.0 * ctrl_loss), s
    assert s["max_abs_smoothed_psnr_diff"] <= max(0.8, 3.0 * ctrl_psnr), s

    # Eval PSNR at every checkpoint within the control band + 0.75 dB.
    for step, diff in s["eval_psnr_diffs"].items():
        ctrl_diff = abs(s["control_eval_psnr_diffs"][step])
        assert abs(diff) <= max(0.75, 3.0 * ctrl_diff), (step, s)
