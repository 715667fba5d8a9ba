"""Reference-checkpoint importer (scripts/import_reference_ckpt.py).

Builds the live PyTorch reference modules with random weights, saves a
checkpoint in the reference's on-disk format (trainer/trainer.py:148-158),
imports it, and asserts (a) the converted pytree equals the parity suite's
module-level converters bit-for-bit, and (b) a Trainer on the run dir
resumes from the imported step with those exact weights."""
import dataclasses
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nrhints_tpu.data.parser import parse_load_nr_data
from tests.data_utils import make_synthetic_scene
from tests.torch_ref import import_reference, renderer_torch_to_params

sys.path.insert(0, "scripts")


@pytest.fixture(scope="module")
def fake_reference_ckpt(tmp_path_factory):
    """A reference-format checkpoint for a tiny cam-opt NRHints model."""
    REF = import_reference()
    torch.manual_seed(0)
    mcfg = REF.neus.NeuSModelConfig(
        sdf_network=REF.sdf_field.SDFNetConfig(
            n_layers=2, d_hidden=32, d_out_feat=16
        ),
        reflectance_network=REF.refl.ReflectanceNetConfig(
            n_layers=2, d_hidden=32
        ),
    )
    renderer = REF.neus.NeuSHintRenderer(mcfg)
    # Perturb away from init so equality checks are meaningful.
    with torch.no_grad():
        for p in renderer.parameters():
            p.add_(torch.randn_like(p) * 0.01)

    n_images = 11  # matches make_synthetic_scene's 6+2+3
    raygen_sd = {
        "ray_generator.cam_pose_adjustment": torch.randn(n_images, 6) * 0.01,
        "ray_generator.pl_adjustment": torch.randn(n_images, 3) * 0.01,
    }
    pipeline_sd = {
        **{f"renderer.{k}": v for k, v in renderer.state_dict().items()},
        **raygen_sd,
    }
    blob = {
        "world_size": 1,
        "global_step": 123_456,
        "pipeline": pipeline_sd,
        "optimizer": {},
        "scheduler": {},
    }
    path = tmp_path_factory.mktemp("ref_ckpt") / "scene_step_0123456.ckpt"
    torch.save(blob, path)
    return path, renderer, raygen_sd


def _tiny_config(base_dir):
    from nrhints_tpu.camera.rays import RayGeneratorConfig
    from nrhints_tpu.configs.config import SystemConfig
    from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
    from nrhints_tpu.fields.sdf import SDFNetConfig
    from nrhints_tpu.render.renderer import ModelConfig, RendererConfig

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
            end_iter=123_456,
        ),
        ray_generator=RayGeneratorConfig(cam_opt_mode="SO3xR3", pl_opt=True),
        base_dir=str(base_dir),
        exp_name="imported",
        scene_name="sphere",
    )


def test_import_matches_module_converters(fake_reference_ckpt, tmp_path):
    from import_reference_ckpt import convert_pipeline_state_dict

    path, renderer, raygen_sd = fake_reference_ckpt
    blob = torch.load(path, map_location="cpu", weights_only=True)
    params, buffers = convert_pipeline_state_dict(blob["pipeline"])

    expect = renderer_torch_to_params(renderer)
    got_leaves = jax.tree_util.tree_leaves_with_path(params["renderer"])
    want_leaves = jax.tree_util.tree_leaves_with_path(expect)
    assert [k for k, _ in got_leaves] == [k for k, _ in want_leaves]
    for (kp, a), (_, b) in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(kp)
        )
    np.testing.assert_array_equal(
        params["raygen"]["cam_pose_adjustment"],
        raygen_sd["ray_generator.cam_pose_adjustment"].numpy(),
    )
    assert buffers == {}


def test_import_then_trainer_resume(fake_reference_ckpt, tmp_path):
    from import_reference_ckpt import import_checkpoint

    from nrhints_tpu.train.trainer import Trainer

    path, renderer, raygen_sd = fake_reference_ckpt
    cfg = _tiny_config(tmp_path / "runs")
    out = import_checkpoint(path, cfg)
    assert out.exists()

    scene = parse_load_nr_data(make_synthetic_scene(tmp_path / "scene"))
    trainer = Trainer(cfg, scene=scene)
    assert trainer.global_step == 123_456

    expect = renderer_torch_to_params(renderer)
    got = jax.device_get(trainer.state.params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got["renderer"]),
        jax.tree_util.tree_leaves_with_path(expect),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7,
            err_msg=jax.tree_util.keystr(kp),
        )
    np.testing.assert_allclose(
        np.asarray(got["raygen"]["pl_adjustment"]),
        raygen_sd["ray_generator.pl_adjustment"].numpy(),
        atol=1e-7,
    )


def test_import_rejects_wrong_config(fake_reference_ckpt, tmp_path):
    """A config whose architecture doesn't match the checkpoint must be
    refused with a clear error, not produce a corrupt run dir."""
    from import_reference_ckpt import import_checkpoint

    path, _, _ = fake_reference_ckpt
    cfg = _tiny_config(tmp_path / "runs_bad")
    cfg = dataclasses.replace(
        cfg,
        ray_generator=dataclasses.replace(cfg.ray_generator, pl_opt=False),
    )
    with pytest.raises(SystemExit, match="does not match"):
        import_checkpoint(path, cfg)
