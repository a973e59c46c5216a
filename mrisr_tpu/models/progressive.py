"""Progressive 3-stage UNet: algorithmic gap bisection for 6 mm spacing.

Mirrors M5 (`/root/reference/src/ModelLoader.py:229-269`): three independent
bias-free UNet stages over a 5-slice window (B, H, W, 5):

- stage 1:  UNet1(i,         i+4)      -> pred i+2
- stage 2A: UNet2(i,         pred i+2) -> pred i+1
- stage 2B: UNet3(pred i+2,  i+4)      -> pred i+3

This is the reference's "long-context" mechanism — recursive bisection along
Z rather than sequence parallelism (SURVEY.md §2.5).  The three stages are
data-dependent (stage 2 consumes stage 1's output) so they stay sequential;
each stage is itself a full-batch MXU workload.  ~93 M params total.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.unet import UNet


class ProgressiveUNet(nn.Module):
    base_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, window, train: bool = False) -> Tuple:
        """window: (B, H, W, 5) channels [i, i+1, i+2, i+3, i+4]."""
        s_i = window[..., 0:1]
        s_i4 = window[..., 4:5]

        stage = lambda name: UNet(  # noqa: E731
            out_channels=1, features=self.base_features, use_bias=False,
            dtype=self.dtype, name=name,
        )

        pred_i2 = stage("unet1")(jnp.concatenate([s_i, s_i4], axis=-1), train)
        pred_i1 = stage("unet2")(jnp.concatenate([s_i, pred_i2], axis=-1), train)
        pred_i3 = stage("unet3")(jnp.concatenate([pred_i2, s_i4], axis=-1), train)
        return pred_i1, pred_i2, pred_i3
