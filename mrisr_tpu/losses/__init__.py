"""Loss library (SURVEY.md §2.3).

- mse / l1 — the workhorse losses (T1).
- ssim_loss — 1 - SSIM with skimage-default window (combined loss term).
- perceptual — VGG16 feature distance (vgg.py).
- lsgan_* — Least-Squares GAN objectives (T3,
  ``results/unet_gan_history.json: config.gan_type``).
- combined_loss — MSE + λp·perceptual + λs·(1 - SSIM) (README.md:82-85, T2).
- progressive_loss — weighted multi-output MSE w=(0.5, 1.0, 0.5) (T4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mrisr_tpu.ops.ssim import ssim_loss  # noqa: F401  (re-export)
from mrisr_tpu.losses.perceptual import (  # noqa: F401  (re-export)
    make_gabor_perceptual_fn,
    make_perceptual_fn,
)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


# ----------------------------------------------------------------- LSGAN
# LSGAN: D minimizes (D(real)-1)^2 + D(fake)^2 ; G minimizes (D(fake)-1)^2.


def lsgan_d_loss(d_real: jax.Array, d_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jnp.square(d_real - 1.0)) + jnp.mean(jnp.square(d_fake))
    )


def lsgan_g_loss(d_fake: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(d_fake - 1.0))


# -------------------------------------------------------------- combined


def combined_loss(
    pred: jax.Array,
    target: jax.Array,
    perceptual_fn=None,
    lambda_perceptual: float = 0.1,
    lambda_ssim: float = 0.1,
    ssim_data_range: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """MSE + λp·VGG + λs·(1-SSIM); NHWC (B, H, W, 1) tensors.

    Returns (total, components).  The reference's exact implementation was
    lost with UNet_Training.ipynb; weights follow the GAN run's house style
    (λ_perceptual = 0.1; SURVEY.md T2).
    """
    m = mse(pred, target)
    s = ssim_loss(pred[..., 0], target[..., 0], data_range=ssim_data_range)
    comps = {"mse": m, "ssim": s}
    total = m + lambda_ssim * s
    if perceptual_fn is not None:
        p = perceptual_fn(pred, target)
        comps["perceptual"] = p
        total = total + lambda_perceptual * p
    return total, comps


# ------------------------------------------------------------ progressive


def progressive_loss(
    preds: Tuple[jax.Array, jax.Array, jax.Array],
    window: jax.Array,
    w_i1: float = 0.5,
    w_i2: float = 1.0,
    w_i3: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted MSE over the three stage outputs vs ground-truth slices
    i+1 / i+2 / i+3 of the (B, H, W, 5) window (center weighted highest;
    ``results/progressive_unet_history.json: config.loss_weights``)."""
    p1, p2, p3 = preds
    l1_ = mse(p1, window[..., 1:2])
    l2_ = mse(p2, window[..., 2:3])
    l3_ = mse(p3, window[..., 3:4])
    total = w_i1 * l1_ + w_i2 * l2_ + w_i3 * l3_
    return total, {"i1": l1_, "i2": l2_, "i3": l3_, "total": total}
