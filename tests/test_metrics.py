import numpy as np

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


def test_lpips_gated_without_weights(monkeypatch):
    monkeypatch.delenv("NRHINTS_LPIPS_WEIGHTS", raising=False)
    from nrhints_tpu.eval import metrics

    metrics._load_lpips_weights.cache_clear()
    assert not lpips_available()
    a = np.zeros((16, 16, 3), np.float32)
    assert np.isnan(lpips(a, a))


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
