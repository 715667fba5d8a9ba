"""Import a PyTorch NRHints checkpoint into an nrhints-tpu run directory.

The reference distributes pretrained ``*_step_1000000.ckpt`` files (7 real +
17 synthetic scenes, reference README.md:87-120) saved as
``torch.save({world_size, global_step, pipeline: state_dict, optimizer,
scheduler})`` (``trainer/trainer.py:148-158``).  This tool converts the
``pipeline`` state dict into this repo's param pytree and writes an orbax
checkpoint the Trainer resumes from — so a reference user can switch
frameworks and keep their trained scenes:

    python scripts/import_reference_ckpt.py path/to/Cat_step_1000000.ckpt \
        config:nr-hints-cam-opt --config.exp-name baseline \
        --config.scene-name Cat [--config...]

The config must describe the SAME architecture the checkpoint was trained
with (presets match the reference's); the importer validates the converted
tree leaf-by-leaf against a fresh ``init_model_params`` of that config and
refuses on any mismatch.  Adam moments and the LR schedule are NOT
imported (optax and torch Adam states are not interchangeable); training
resumed from an imported checkpoint restarts its optimizer — fine for
eval / fine-tuning, documented here for honesty.  Key mapping mirrors
``tests/torch_ref.py``'s module converters, which the parity suite proves
correct against the live reference.
"""
from __future__ import annotations

import pathlib
import sys
import warnings

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _strip_prefix(sd: dict, prefix: str = "module.") -> dict:
    """Drop a DDP 'module.' prefix if present."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    return sd


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _wn_linear(sd: dict, key: str) -> dict:
    """weight-norm'd nn.Linear state entries -> {'v': [in,out], 'g': [out],
    'b': [out]} (tests/torch_ref.py::_wn_linear_to_params)."""
    return {
        "v": _np(sd[f"{key}.weight_v"]).T.copy(),
        "g": _np(sd[f"{key}.weight_g"]).reshape(-1).copy(),
        "b": _np(sd[f"{key}.bias"]).copy(),
    }


def _linear(sd: dict, key: str) -> dict:
    return {
        "w": _np(sd[f"{key}.weight"]).T.copy(),
        "b": _np(sd[f"{key}.bias"]).copy(),
    }


def convert_pipeline_state_dict(sd: dict) -> tuple[dict, dict]:
    """Reference pipeline.state_dict() -> (our params pytree, noise buffers).

    Returns ``params = {"renderer": {...}, "raygen": {...}}`` plus any
    synthetic-noise buffers (``cam_pose_noise``/``pl_noise`` — persistent
    torch buffers, ``camera/ray_generator.py:67,73``)."""
    sd = _strip_prefix(sd)

    # SDF network: hidden lin{i} + dual heads (fields/sdf_field.py:84,102).
    n_sdf_hidden = len(
        {k.split(".")[2] for k in sd
         if k.startswith("renderer.sdf_network.lin")}
    )
    sdf = {
        f"lin{i}": _wn_linear(sd, f"renderer.sdf_network.lin{i}")
        for i in range(n_sdf_hidden)
    }
    sdf["out_sdf"] = _wn_linear(sd, "renderer.sdf_network.out_sdf")
    sdf["out_feat"] = _wn_linear(sd, "renderer.sdf_network.out_feat")

    n_color = len(
        {k.split(".")[2] for k in sd
         if k.startswith("renderer.color_network.lin")}
    )
    color = {
        f"lin{i}": _wn_linear(sd, f"renderer.color_network.lin{i}")
        for i in range(n_color)
    }

    renderer = {
        "sdf": sdf,
        "variance": {"variance": _np(sd["renderer.deviation_network.variance"])},
        "color": color,
    }

    if any(k.startswith("renderer.outside_nerf.") for k in sd):
        n_pts = len(
            {k.split(".")[3] for k in sd
             if k.startswith("renderer.outside_nerf.pts_linears.")}
        )
        bg = {
            f"pts_lin{i}": _linear(sd, f"renderer.outside_nerf.pts_linears.{i}")
            for i in range(n_pts)
        }
        bg["views_lin0"] = _linear(sd, "renderer.outside_nerf.views_linears.0")
        bg["feature"] = _linear(sd, "renderer.outside_nerf.feature_linear")
        bg["alpha"] = _linear(sd, "renderer.outside_nerf.alpha_linear")
        bg["rgb"] = _linear(sd, "renderer.outside_nerf.rgb_linear")
        renderer["bg"] = bg

    raygen = {}
    for name in ("cam_pose_adjustment", "pl_adjustment"):
        if f"ray_generator.{name}" in sd:
            raygen[name] = _np(sd[f"ray_generator.{name}"])

    buffers = {}
    for name in ("cam_pose_noise", "pl_noise"):
        if f"ray_generator.{name}" in sd:
            buffers[name] = _np(sd[f"ray_generator.{name}"])

    return {"renderer": renderer, "raygen": raygen}, buffers


def import_checkpoint(ckpt_path, cfg, step: int | None = None) -> pathlib.Path:
    """Convert ``ckpt_path`` and write it as an orbax checkpoint under the
    run dir implied by ``cfg``; returns the checkpoint path."""
    import jax
    import jax.numpy as jnp
    import torch

    from nrhints_tpu.render.renderer import init_model_params
    from nrhints_tpu.train.checkpoint import CheckpointIO
    from nrhints_tpu.train.step import init_train_state, make_optimizer

    try:
        blob = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:
        # Older torch pickles (e.g. the scheduler entry) may need full
        # unpickling; the file is the user's own training artifact.
        warnings.warn("weights_only load failed; falling back to full unpickle")
        blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)

    params, noise_buffers = convert_pipeline_state_dict(blob["pipeline"])
    step = int(blob.get("global_step", 0)) if step is None else step

    # Validate against a fresh init of the SAME config: structure, shapes,
    # dtypes must agree or the Trainer's orbax restore would reject it.
    ref_tree = jax.tree_util.tree_map(
        np.asarray,
        {
            "renderer": init_model_params(jax.random.PRNGKey(0), cfg.model),
            "raygen": __import__(
                "nrhints_tpu.camera.rays", fromlist=["ray_generator_init"]
            ).ray_generator_init(jax.random.PRNGKey(0), cfg.ray_generator, 1)[0],
        },
    )
    got = jax.tree_util.tree_structure(params)
    want = jax.tree_util.tree_structure(ref_tree)
    if got != want:
        raise SystemExit(
            f"checkpoint structure does not match the given config:\n"
            f"  checkpoint: {got}\n  config:     {want}\n"
            "Pick the preset/flags the scene was trained with (e.g. "
            "config:nr-hints-cam-opt for real scenes, --config.model."
            "renderer.use-outside-nerf True for black-background captures)."
        )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(ref_tree),
    ):
        # Per-image raygen tables size with the scene, not the config.
        if a.shape[1:] != b.shape[1:] and a.shape != b.shape:
            raise SystemExit(
                f"shape mismatch at {jax.tree_util.keystr(kp)}: "
                f"checkpoint {a.shape} vs config {b.shape}"
            )

    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = init_train_state(params, make_optimizer(cfg))
    state = state.replace(step=jnp.asarray(step, jnp.int32))

    run_dir = pathlib.Path(cfg.base_dir) / cfg.exp_name / cfg.scene_name
    io = CheckpointIO(run_dir)
    io.save(step, state, world_size=1)
    out = io.ckpt_dir / f"step_{step:07d}"

    if noise_buffers:
        np.savez(out / "imported_noise_buffers.npz", **noise_buffers)
        warnings.warn(
            "checkpoint carries synthetic pose/pl noise buffers; saved to "
            f"{out / 'imported_noise_buffers.npz'}. The trainer regenerates "
            "noise from --config.seed — rendering with the exact trained "
            "noise requires matching the original seed (noise ablations "
            "only; released scene checkpoints train without noise)."
        )
    print(f"imported step {step} -> {out}")
    return out


def main(argv) -> None:
    from nrhints_tpu.configs.cli import parse_cli
    from nrhints_tpu.configs.config import DEFAULT_PRESET, PRESETS

    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    ckpt = argv[0]
    cfg = parse_cli(PRESETS, DEFAULT_PRESET, argv[1:])
    import_checkpoint(ckpt, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
