import pytest

from nrhints_tpu.configs.cli import config_to_dict, parse_cli
from nrhints_tpu.configs.config import DEFAULT_PRESET, PRESETS


def parse(argv):
    return parse_cli(PRESETS, DEFAULT_PRESET, argv)


def test_default_preset_is_cam_opt():
    cfg = parse([])
    assert cfg.ray_generator.cam_opt_mode == "SO3xR3"


def test_preset_selection():
    assert parse(["config:nr-hints"]).ray_generator.cam_opt_mode == "off"
    assert parse(["nr-hints"]).ray_generator.cam_opt_mode == "off"
    plain = parse(["config:pl-naive"])
    assert plain.model.renderer.shadow_hint is False
    assert plain.model.renderer.specular_hint is False


def test_unknown_preset_errors():
    with pytest.raises(SystemExit):
        parse(["config:nope"])


def test_scalar_overrides():
    cfg = parse(
        [
            "config:nr-hints",
            "--config.model.lr", "1e-3",
            "--config.model.batch_size", "128",
            "--config.data.path", "/tmp/x",
            "--config.seed", "1",
        ]
    )
    assert cfg.model.lr == 1e-3
    assert cfg.model.batch_size == 128
    assert cfg.data.path == "/tmp/x"
    assert cfg.seed == 1


def test_dash_flag_spelling_matches_reference_scripts():
    """Reference scripts use e.g. --config.data.view-num-limit 1000."""
    cfg = parse(
        [
            "config:nr-hints-cam-opt",
            "--config.data.view-num-limit", "1000",
            "--config.data.white-background", "False",
            "--config.model.geometry-warmup-end", "100000",
            "--config.model.sdf-network.init-bias", "0.05",
            "--config.data.is-z-up", "True",
        ]
    )
    assert cfg.data.view_num_limit == 1000
    assert cfg.data.white_background is False
    assert cfg.model.geometry_warmup_end == 100000
    assert cfg.model.sdf_network.init_bias == 0.05
    assert cfg.data.is_z_up is True


def test_bool_requires_explicit_value():
    with pytest.raises(ValueError):
        parse(["--config.data.white_background", "maybe"])


def test_equals_syntax_and_deep_paths():
    cfg = parse(["--config.model.renderer.n_samples=32"])
    assert cfg.model.renderer.n_samples == 32


def test_literal_validation():
    cfg = parse(["--config.ray_generator.cam_opt_mode", "SE3"])
    assert cfg.ray_generator.cam_opt_mode == "SE3"
    with pytest.raises(ValueError):
        parse(["--config.ray_generator.cam_opt_mode", "SE9"])


def test_tuple_override():
    cfg = parse(["--config.model.renderer.specular_roughness", "0.1,0.2"])
    assert cfg.model.renderer.specular_roughness == (0.1, 0.2)


def test_optional_field():
    cfg = parse(["--config.ckpt_path", "/tmp/ck"])
    assert cfg.ckpt_path == "/tmp/ck"
    cfg = parse(["--config.ckpt_path", "None"])
    assert cfg.ckpt_path is None


def test_unknown_flag_errors():
    with pytest.raises(KeyError):
        parse(["--config.model.no_such_field", "3"])


def test_config_to_dict_roundtrippable():
    import json

    d = config_to_dict(parse([]))
    s = json.dumps(d)
    assert json.loads(s)["model"]["lr"] == 5e-4
    assert json.loads(s)["data"]["pixel_sampling_strategy"] == "all_images"


def test_parallel_flags():
    cfg = parse(
        [
            "config:nr-hints",
            "--config.parallel.scale-global-batch", "True",
            "--config.parallel.batch-scale-lr-rule", "sqrt",
            "--config.parallel.steps-per-dispatch", "8",
        ]
    )
    assert cfg.parallel.scale_global_batch is True
    assert cfg.parallel.batch_scale_lr_rule == "sqrt"
    assert cfg.parallel.steps_per_dispatch == 8
