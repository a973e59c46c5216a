"""Parity tests: resize and z-score must match the reference's torch semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mrisr_tpu.ops.resize import resize_bilinear
from mrisr_tpu.ops.stats import minmax_normalize, zscore_slices


@pytest.mark.parametrize("in_hw", [(128, 128), (300, 280), (256, 256), (60, 70)])
def test_resize_matches_torch_bilinear(in_hw):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, *in_hw)).astype(np.float32)
    # reference path: F.interpolate(mode='bilinear', align_corners=False)
    # == TF.resize(..., BILINEAR, antialias=False) on tensors
    want = (
        F.interpolate(
            torch.from_numpy(x).unsqueeze(1),
            size=(256, 256),
            mode="bilinear",
            align_corners=False,
        )
        .squeeze(1)
        .numpy()
    )
    got = np.asarray(resize_bilinear(x, (256, 256)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_resize_identity():
    x = np.random.default_rng(0).standard_normal((3, 256, 256)).astype(np.float32)
    got = np.asarray(resize_bilinear(x, (256, 256)))
    np.testing.assert_array_equal(got, x)


def test_zscore_matches_reference_formula():
    rng = np.random.default_rng(5)
    vol = (rng.random((4, 31, 33)) * 900 + 50).astype(np.float32)
    got = np.asarray(zscore_slices(vol))
    for z in range(vol.shape[0]):
        s = vol[z]
        want = (s - s.mean()) / (s.std() + 1e-6)  # ddof=0, eps outside sqrt
        np.testing.assert_allclose(got[z], want, atol=1e-5)
    # z-scored slices have ~0 mean, ~1 std
    assert abs(got[0].mean()) < 1e-5
    assert abs(got[0].std() - 1.0) < 1e-3


def test_minmax_normalize():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 16, 16)).astype(np.float32) * 5
    y = np.asarray(minmax_normalize(x))
    assert y.min() >= 0.0 and y.max() <= 1.0
    for i in range(2):
        want = (x[i] - x[i].min()) / (x[i].max() - x[i].min() + 1e-8)
        np.testing.assert_allclose(y[i], want, atol=1e-6)
