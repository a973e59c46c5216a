"""Golden tests for SSIM/PSNR.

The JAX/Pallas implementations are validated against an INDEPENDENT numpy
transcription of the published SSIM definition with skimage's documented
defaults (7x7 uniform window, sample covariance, border crop) — and against
skimage itself when it is installed.
"""

import numpy as np
import pytest

from mrisr_tpu.ops.ssim import psnr, ssim, ssim_map
from mrisr_tpu.ops.ssim_pallas import ssim_pallas


def _uniform_filter_valid_np(x, win):
    h, w = x.shape
    out = np.zeros((h - win + 1, w - win + 1), dtype=np.float64)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            out[i, j] = x[i : i + win, j : j + win].mean()
    return out


def _ssim_np(x, y, data_range=1.0, win=7, k1=0.01, k2=0.03):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    ux = _uniform_filter_valid_np(x, win)
    uy = _uniform_filter_valid_np(y, win)
    uxx = _uniform_filter_valid_np(x * x, win)
    uyy = _uniform_filter_valid_np(y * y, win)
    uxy = _uniform_filter_valid_np(x * y, win)
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


@pytest.fixture(scope="module")
def image_pairs():
    rng = np.random.default_rng(7)
    pairs = []
    for _ in range(3):
        x = rng.random((40, 48)).astype(np.float32)
        y = np.clip(x + 0.1 * rng.standard_normal((40, 48)), 0, 1).astype(np.float32)
        pairs.append((x, y))
    # identical pair -> ssim 1
    x = rng.random((40, 48)).astype(np.float32)
    pairs.append((x, x.copy()))
    return pairs


def test_ssim_matches_numpy_reference(image_pairs):
    for x, y in image_pairs:
        expected = _ssim_np(x, y)
        got = float(ssim(x, y, data_range=1.0))
        assert abs(got - expected) < 2e-5, (got, expected)


def test_ssim_matches_skimage_if_available(image_pairs):
    skimage = pytest.importorskip("skimage.metrics")
    for x, y in image_pairs:
        expected = skimage.structural_similarity(x, y, data_range=1.0)
        got = float(ssim(x, y, data_range=1.0))
        assert abs(got - expected) < 2e-5


def test_ssim_identical_is_one():
    x = np.random.default_rng(0).random((32, 32)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_batched_shapes():
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    y = rng.random((2, 3, 32, 32)).astype(np.float32)
    s = ssim(x, y)
    assert s.shape == (2, 3)
    m = ssim_map(x, y)
    assert m.shape == (2, 3, 26, 26)


def test_ssim_pallas_matches_xla(image_pairs):
    xs = np.stack([p[0] for p in image_pairs])
    ys = np.stack([p[1] for p in image_pairs])
    ref = np.asarray(ssim(xs, ys))
    got = np.asarray(ssim_pallas(xs, ys))  # interpret mode on CPU
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_psnr_matches_definition(image_pairs):
    for x, y in image_pairs[:3]:
        mse = np.mean((x.astype(np.float64) - y.astype(np.float64)) ** 2)
        expected = 10 * np.log10(1.0 / mse)
        got = float(psnr(x, y, data_range=1.0))
        assert abs(got - expected) < 1e-4


def test_psnr_matches_skimage_if_available(image_pairs):
    skimage = pytest.importorskip("skimage.metrics")
    for x, y in image_pairs[:3]:
        expected = skimage.peak_signal_noise_ratio(x, y, data_range=1.0)
        assert abs(float(psnr(x, y)) - expected) < 1e-4
