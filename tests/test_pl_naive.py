"""End-to-end smoke of the ``pl-naive`` model family (no shadow/specular
hints — the reference's third preset, ``configs/pl_naive.py``): a few
train steps plus a whole-image eval render with the hint branches compiled
out.  The hint-off forward is parity-tested per component
(tests/test_renderer.py, test_fields.py); this pins that the full train
loop and eval path run the no-hints configuration too."""
import dataclasses

import numpy as np
import pytest

from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.train.trainer import Trainer
from tests.data_utils import make_synthetic_scene
from tests.test_trainer_e2e import e2e_config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = make_synthetic_scene(tmp_path_factory.mktemp("scene_plnaive"))
    return parse_load_nr_data(d)


def test_pl_naive_trains_and_renders(scene, tmp_path):
    cfg = e2e_config(tmp_path, end_iter=6)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            renderer=dataclasses.replace(
                cfg.model.renderer, shadow_hint=False, specular_hint=False
            ),
        ),
        exp_name="pl_naive",
    )
    trainer = Trainer(cfg, scene=scene)
    losses = [trainer.train_iter()["loss"] for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)

    import jax

    from nrhints_tpu.eval.evaluator import Evaluator

    ev = Evaluator(
        cfg, trainer.camera, jax.device_get(trainer.buffers), mesh=None
    )
    res = ev.render_image(
        jax.device_get(trainer.state.params), trainer.data_manager.get_test_view(0)
    )
    assert "shadow_map" not in res  # hint branch really compiled out
    assert np.isfinite(res["rgb"]).all() and np.isfinite(res["depth"]).all()
