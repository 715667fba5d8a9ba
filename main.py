"""CLI entry: python main.py [config:<preset>] --config.<path> <value> ...

Mirrors the reference entrypoint (iamNCJ/NRHints main.py) with the same
preset names and dotted flag spellings, e.g.:

    python main.py config:nr-hints --config.data.path /data/Cup_Plane --config.scene-name cup
"""
from nrhints_tpu.configs.cli import parse_cli
from nrhints_tpu.configs.config import DEFAULT_PRESET, PRESETS

if __name__ == "__main__":
    config = parse_cli(PRESETS, DEFAULT_PRESET)
    from nrhints_tpu.train.trainer import launch

    launch(config)
