"""Harness for golden-parity tests: loads the PyTorch reference (read-only at
/root/reference) and converts its weights into nrhints_tpu param pytrees.

The reference is imported as-is (with a stub for its unused-at-test-time
``mcubes`` dependency); nothing from it is vendored into this repo — it is
only executed to produce golden outputs the TPU implementation must match
(BASELINE.md: images and pixel gradients allclose).
"""
from __future__ import annotations

import sys
import types

import numpy as np

_REFERENCE_PATH = "/root/reference"


def import_reference():
    """Make the reference package importable; returns its module namespace."""
    if "mcubes" not in sys.modules:
        sys.modules["mcubes"] = types.ModuleType("mcubes")
    if "tyro" not in sys.modules:  # shm_helper/main_config import it at module level
        tyro_stub = types.ModuleType("tyro")
        conf_stub = types.ModuleType("tyro.conf")

        class _PassthroughAnnotation:
            """tyro.conf.FlagConversionOff[T] -> T (annotation-time only)."""

            def __class_getitem__(cls, item):
                return item

        conf_stub.FlagConversionOff = _PassthroughAnnotation
        tyro_stub.conf = conf_stub
        sys.modules["tyro"] = tyro_stub
        sys.modules["tyro.conf"] = conf_stub
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import models.neus_hint_model as neus  # noqa
    import fields.sdf_field as sdf_field  # noqa
    import fields.reflectance_network as refl  # noqa
    import fields.nerf_density_field as bg  # noqa
    import fields.encodings as encodings  # noqa
    import camera.ray_utils as ray_utils  # noqa
    import camera.lie_groups as lie_groups  # noqa

    return types.SimpleNamespace(
        neus=neus,
        sdf_field=sdf_field,
        refl=refl,
        bg=bg,
        encodings=encodings,
        ray_utils=ray_utils,
        lie_groups=lie_groups,
    )


def import_reference_pipeline():
    """Import the reference's pipeline layer (``pipelines/base_pipeline.py``)
    for whole-image eval parity.  Its module imports pull in torchmetrics and
    lpips, which this image does not ship — stub them with raising callables;
    the parity test feeds ``rgb_gt=None`` so ``get_eval_dicts`` never touches
    a metric (``pipelines/base_pipeline.py:144-148``)."""
    import_reference()

    def _stubbed_metric(*_a, **_k):  # pragma: no cover - must never run
        raise RuntimeError("torchmetrics/lpips are stubbed in parity tests")

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        func = types.ModuleType("torchmetrics.functional")
        img = types.ModuleType("torchmetrics.functional.image")
        img.peak_signal_noise_ratio = _stubbed_metric
        img.structural_similarity_index_measure = _stubbed_metric
        func.image = img
        tm.functional = func
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = func
        sys.modules["torchmetrics.functional.image"] = img
    if "lpips" not in sys.modules:
        lp = types.ModuleType("lpips")
        lp.LPIPS = _stubbed_metric
        sys.modules["lpips"] = lp

    import camera.camera_model as camera_model  # noqa
    import data.data_loader as data_loader  # noqa
    import pipelines.base_pipeline as base_pipeline  # noqa

    return types.SimpleNamespace(
        base_pipeline=base_pipeline,
        data_loader=data_loader,
        camera_model=camera_model,
    )


# ---------------------------------------------------------------------------
# Weight conversion: torch modules -> nrhints_tpu param pytrees


def _wn_linear_to_params(lin) -> dict:
    """torch weight_norm'd nn.Linear -> {'v': [in,out], 'g': [out], 'b': [out]}."""
    import torch

    with torch.no_grad():
        v = lin.weight_v.detach().cpu().numpy().T.copy()
        g = lin.weight_g.detach().cpu().numpy().reshape(-1).copy()
        b = lin.bias.detach().cpu().numpy().copy()
    return {"v": v, "g": g, "b": b}


def _linear_to_params(lin) -> dict:
    import torch

    with torch.no_grad():
        return {
            "w": lin.weight.detach().cpu().numpy().T.copy(),
            "b": lin.bias.detach().cpu().numpy().copy(),
        }


def sdf_torch_to_params(net) -> dict:
    params = {}
    for i in range(net.num_layers - 2):
        params[f"lin{i}"] = _wn_linear_to_params(getattr(net, f"lin{i}"))
    params["out_sdf"] = _wn_linear_to_params(net.out_sdf)
    params["out_feat"] = _wn_linear_to_params(net.out_feat)
    return params


def reflectance_torch_to_params(net) -> dict:
    return {
        f"lin{i}": _wn_linear_to_params(getattr(net, f"lin{i}"))
        for i in range(net.num_layers - 1)
    }


def bg_nerf_torch_to_params(net) -> dict:
    params = {}
    for i, lin in enumerate(net.pts_linears):
        params[f"pts_lin{i}"] = _linear_to_params(lin)
    params["views_lin0"] = _linear_to_params(net.views_linears[0])
    params["feature"] = _linear_to_params(net.feature_linear)
    params["alpha"] = _linear_to_params(net.alpha_linear)
    params["rgb"] = _linear_to_params(net.rgb_linear)
    return params


def renderer_torch_to_params(renderer) -> dict:
    import torch

    params = {
        "sdf": sdf_torch_to_params(renderer.sdf_network),
        "variance": {
            "variance": renderer.deviation_network.variance.detach().cpu().numpy().copy()
        },
        "color": reflectance_torch_to_params(renderer.color_network),
    }
    if getattr(renderer, "has_outside_nerf", False):
        params["bg"] = bg_nerf_torch_to_params(renderer.outside_nerf)
    return params
