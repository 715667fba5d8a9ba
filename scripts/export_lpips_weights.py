"""Export LPIPS(AlexNet) weights to the npz format `nrhints_tpu.eval.metrics`
loads (env var ``NRHINTS_LPIPS_WEIGHTS``).

Run this ONCE on any machine that has the ``lpips`` pip package (which
bundles the torchvision AlexNet trunk + the LPIPS linear calibration):

    pip install lpips torch
    python scripts/export_lpips_weights.py --out lpips_alex.npz

then point this repo at the file:

    export NRHINTS_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

Key layout consumed by ``eval/metrics.py::_alexnet_features`` / ``lpips``:
    conv{0..4}_w  [out, in, kh, kw]   AlexNet conv trunk (features 0,3,6,8,10)
    conv{0..4}_b  [out]
    lin{0..4}_w   [1, C, 1, 1]        LPIPS per-channel calibration weights

This container image intentionally does NOT ship lpips/torchvision (and has
no network egress), so the metric is weights-gated: ``lpips()`` returns NaN
until the file exists (reference behavior lives in iamNCJ/NRHints
``utils/metrics.py:18-24``).
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    args = ap.parse_args()

    import numpy as np

    try:
        import lpips as lpips_pkg
    except ImportError as e:  # pragma: no cover - exporter needs the dep
        raise SystemExit(
            "the `lpips` package is required to export weights: pip install lpips"
        ) from e

    model = lpips_pkg.LPIPS(net="alex", spatial=False)
    model.eval()

    out: dict[str, np.ndarray] = {}
    # AlexNet conv trunk: torchvision indices of the 5 conv layers.
    # lpips wraps torchvision AlexNet features as slices [0:2],[2:5],[5:8],
    # [8:10],[10:12]; slices 2/3 start with a maxpool, 4/5 with the conv.
    convs = [model.net.slice1[0], model.net.slice2[1], model.net.slice3[1],
             model.net.slice4[0], model.net.slice5[0]]
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()

    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
