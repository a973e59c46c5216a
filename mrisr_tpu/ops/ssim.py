"""SSIM / PSNR with exact scikit-image semantics.

SSIM is the acceptance metric of the reference (README results table;
`/root/reference/src/VolumeVisualization.py:237-269` and the notebook evals
all call ``skimage.metrics.structural_similarity`` with ``data_range=1.0`` and
defaults).  skimage defaults, reproduced here:

- 7x7 *uniform* window (not Gaussian),
- sample covariance normalization ``NP/(NP-1)`` with ``NP = 7*7 = 49``,
- K1=0.01, K2=0.03,
- the (win//2)-pixel border is cropped before averaging.

Because the border is cropped, boundary handling of the uniform filter is
irrelevant: a VALID-window filter produces exactly the retained values, which
lets the whole metric run as two small separable convolutions per moment map.
A fused single-pass Pallas kernel lives in ops/ssim_pallas.py; this module is
the XLA reference path (also used for the differentiable SSIM *loss*).

Golden-tested against an independent numpy implementation (and skimage when
available) in tests/test_ssim.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Separable VALID-window mean filter over the trailing two dims.

    x: (N, H, W) -> (N, H-win+1, W-win+1)
    """
    n, h, w = x.shape
    kernel = jnp.full((win,), 1.0 / win, dtype=x.dtype)
    # filter rows: treat as (N*W?) simpler: conv over H then W with
    # conv_general_dilated in NCHW with 1 channel.
    x4 = x[:, None, :, :]  # (N, 1, H, W)
    kh = kernel.reshape(1, 1, win, 1)
    kw = kernel.reshape(1, 1, 1, win)
    dn = jax.lax.conv_dimension_numbers(x4.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(x4, kh, (1, 1), "VALID", dimension_numbers=dn)
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn)
    return y[:, 0]


def ssim_map(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Cropped SSIM map for batches of images.

    x, y: (..., H, W) -> (..., H - win + 1, W - win + 1), float32.
    """
    assert x.shape == y.shape, (x.shape, y.shape)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.astype(jnp.float32).reshape(-1, h, w)
    yf = y.astype(jnp.float32).reshape(-1, h, w)

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # skimage use_sample_covariance=True

    ux = _uniform_filter_valid(xf, win_size)
    uy = _uniform_filter_valid(yf, win_size)
    uxx = _uniform_filter_valid(xf * xf, win_size)
    uyy = _uniform_filter_valid(yf * yf, win_size)
    uxy = _uniform_filter_valid(xf * yf, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return s.reshape(*lead, s.shape[-2], s.shape[-1])


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    use_pallas: bool = False,
) -> jax.Array:
    """Mean SSIM per image: (..., H, W) -> (...)  matching skimage defaults."""
    if use_pallas:
        from mrisr_tpu.ops.ssim_pallas import ssim_pallas

        return ssim_pallas(x, y, data_range=data_range, win_size=win_size)
    return jnp.mean(ssim_map(x, y, data_range, win_size), axis=(-2, -1))


def psnr(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB over the trailing two dims (skimage convention:

    ``10 * log10(data_range**2 / MSE)``).
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    mse = jnp.mean(jnp.square(xf - yf), axis=(-2, -1))
    return 10.0 * jnp.log10((data_range * data_range) / mse)


def ssim_loss(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
) -> jax.Array:
    """Differentiable ``1 - SSIM`` scalar loss (mean over the batch).

    Used inside the combined loss (reference README.md:82-85).  The
    z-scored targets are not bounded in [0,1]; following common practice we
    evaluate the loss with the given data_range over raw values.
    """
    return 1.0 - jnp.mean(ssim(pred, target, data_range=data_range, win_size=win_size))
