"""Image quality metrics: PSNR, SSIM (pure jnp), and gated LPIPS.

Reference surface: ``utils/metrics.py`` in iamNCJ/NRHints (torchmetrics
PSNR/SSIM at data_range=1 and AlexNet LPIPS).  PSNR/SSIM are reimplemented
in jnp with torchmetrics-compatible defaults (SSIM: 11x11 gaussian window,
sigma 1.5, k1=0.01, k2=0.03, per-channel then averaged).  LPIPS needs
pretrained AlexNet weights, which this zero-egress image cannot download:
``lpips()`` loads them from ``NRHINTS_LPIPS_WEIGHTS`` (an .npz) when
present and returns NaN otherwise — the trainer logs it as unavailable
rather than failing.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def _psnr_jit(rgb, rgb_gt, data_range):
    mse = jnp.mean((rgb - rgb_gt) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / (mse + 1e-12))


def psnr(rgb: jnp.ndarray, rgb_gt: jnp.ndarray, data_range: float = 1.0) -> float:
    return float(_psnr_jit(jnp.asarray(rgb), jnp.asarray(rgb_gt), data_range))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


@functools.partial(jax.jit, static_argnums=(2,))
def _ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float) -> jnp.ndarray:
    """[H, W, C] images -> mean SSIM (gaussian-weighted, torchmetrics defaults)."""
    k = _gaussian_kernel()[None, None]  # [1,1,11,11]
    c = img1.shape[-1]
    kernel = jnp.tile(k, (c, 1, 1, 1))  # depthwise

    def filt(x):
        x = jnp.moveaxis(x, -1, 0)[None]  # [1,C,H,W]
        # HIGHEST precision: TPU default rounds conv operands to bf16, and
        # the variance terms below are differences of nearly equal numbers —
        # bf16 noise there can push SSIM visibly above 1 on flat regions.
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID", feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )
        return y[0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def ssim(rgb: jnp.ndarray, rgb_gt: jnp.ndarray, data_range: float = 1.0) -> float:
    return float(_ssim_map(jnp.asarray(rgb), jnp.asarray(rgb_gt), data_range))


# ---------------------------------------------------------------------------
# LPIPS (AlexNet) — weights-gated


_LPIPS_ENV = "NRHINTS_LPIPS_WEIGHTS"


@functools.lru_cache(maxsize=1)
def _load_lpips_weights():
    path = os.environ.get(_LPIPS_ENV)
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def lpips_available() -> bool:
    return _load_lpips_weights() is not None


def _alexnet_features(w: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """AlexNet conv trunk -> the 5 relu feature maps LPIPS taps.

    x: [1, 3, H, W] normalized input.  Weight keys: conv{i}_w [out,in,kh,kw],
    conv{i}_b; strides/pads per the torchvision AlexNet architecture.
    """
    feats = []
    conf = [  # (stride, pad, pool_before)
        (4, 2, False),
        (1, 2, True),
        (1, 1, True),
        (1, 1, False),
        (1, 1, False),
    ]
    for i, (stride, pad, pool) in enumerate(conf):
        if pool:
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
        # HIGHEST precision: the LPIPS distance is built from differences of
        # unit-normalized features of nearly identical images — the same
        # catastrophic-cancellation pattern that pushed SSIM above 1 under
        # the TPU default's bf16 operand rounding (see _ssim_map).
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{i}_w"], (stride, stride), [(pad, pad), (pad, pad)],
            precision=jax.lax.Precision.HIGHEST,
        ) + w[f"conv{i}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


@jax.jit
def _lpips_jit(w: dict, rgb: jnp.ndarray, rgb_gt: jnp.ndarray) -> jnp.ndarray:
    """The whole two-trunk LPIPS forward in ONE compiled program — eager
    dispatch of ~60 convs/reductions is minutes-slow over a remote device
    link, and this runs once per test view."""
    # normalize=True semantics: inputs in [0,1] -> [-1,1], then ImageNet-ish
    # scaling baked into the lpips 'shift'/'scale' constants.
    shift = jnp.array([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = jnp.array([0.458, 0.448, 0.450])[None, :, None, None]

    def prep(img):
        img = jnp.moveaxis(img, -1, 0)[None] * 2.0 - 1.0
        return (img - shift) / scale

    f1 = _alexnet_features(w, prep(rgb))
    f2 = _alexnet_features(w, prep(rgb_gt))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a ** 2, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b ** 2, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = w[f"lin{i}_w"]  # [1, C, 1, 1]
        d = jnp.sum(d * lin, axis=1, keepdims=True)
        total = total + jnp.mean(d)
    return total


def lpips(rgb: jnp.ndarray, rgb_gt: jnp.ndarray) -> float:
    """LPIPS(alex) distance; NaN when pretrained weights are unavailable."""
    w = _load_lpips_weights()
    if w is None:
        return float("nan")
    return float(_lpips_jit(w, jnp.asarray(rgb), jnp.asarray(rgb_gt)))
