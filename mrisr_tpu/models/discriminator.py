"""PatchGAN discriminator for the UNet-GAN (LSGAN) configuration.

The reference's discriminator source was lost with ``UNet_GAN_Training.ipynb``
— its existence and type survive in ``results/unet_gan_history.json``
(``config.discriminator: "PatchGAN"``, ``config.gan_type: "LSGAN"``) and
README.md:91-93.  Per SURVEY.md M9, the rebuild is the standard conditional
70x70 PatchGAN (pix2pix convention): input = concat(pre, post, candidate)
(B, H, W, 3); C64-C128-C256 stride 2, C512 stride 1, then a 1-channel 4x4
conv — a (B, 30, 30, 1) patch-realness map at 256².  LeakyReLU(0.2), BN on
all but the first block.  LSGAN trains its outputs toward 1 (real) / 0 (fake)
with MSE (losses/gan.py).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.blocks import BN_EPS, BN_MOMENTUM


class PatchGAN(nn.Module):
    base_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_features
        pad = ((1, 1), (1, 1))

        x = nn.Conv(f, (4, 4), strides=(2, 2), padding=pad, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)

        for width, stride in ((f * 2, 2), (f * 4, 2), (f * 8, 1)):
            x = nn.Conv(
                width, (4, 4), strides=(stride, stride), padding=pad,
                use_bias=False, dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype,
            )(x)
            x = nn.leaky_relu(x, 0.2)

        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=pad, dtype=self.dtype)(x)
        if 0 in x.shape[1:3]:
            # shapes are static under jit, so this is a trace-time check:
            # a too-small input yields an EMPTY patch map, and the LSGAN
            # losses' mean over zero elements is a silent NaN
            raise ValueError(
                f"PatchGAN patch map is empty ({x.shape}) — input "
                "image_size is too small for the 70x70 receptive field "
                "(needs >= 32 pixels per side)"
            )
        return x.astype(jnp.float32)
