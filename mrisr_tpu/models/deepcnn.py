"""DeepCNN: ResNet-style stride-1 baseline, (B, H, W, 2) -> (B, H, W, 1).

Mirrors M6/M7 (`/root/reference/src/ModelLoader.py:276-377`):
7x7 s1 conv -> BN/ReLU -> MaxPool(3, stride 1, pad 1) -> four layers of
[2,2,2,2] residual blocks, ALL stride 1 (64->128->256->512), then a 1x1 conv
to 1 channel.  Spatial dims never shrink.  The reference defines an
``avgpool`` that its forward never calls (`:335` vs `:361-377`) — dead code,
intentionally not reproduced.  Kaiming-normal fan-out init on convs, BN
weight=1/bias=0, matching `:339-344`.  ~12 M params.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.blocks import (
    BN_EPS,
    BN_MOMENTUM,
    kaiming_normal_fan_out,
    max_pool_3x3_s1,
)


class ResidualBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name=name,
        )
        identity = x
        h = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype, name="conv1",
        )(x)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype, name="conv2",
        )(h)
        h = bn("bn2")(h)
        if x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), use_bias=False,
                kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class DeepCNN(nn.Module):
    out_channels: int = 1
    base_features: int = 64
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_features
        x = nn.Conv(
            f, (7, 7), padding=3, use_bias=False,
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = max_pool_3x3_s1(x)

        # one doubling stage per num_blocks entry (reference is 4 stages,
        # ModelLoader.py:309-377); deriving widths from len(num_blocks)
        # instead of a fixed 4-list means a longer config BUILDS longer —
        # zip would silently truncate it
        widths = [f * (2 ** i) for i in range(len(self.num_blocks))]
        for layer_idx, (width, blocks) in enumerate(zip(widths, self.num_blocks)):
            for b in range(blocks):
                x = ResidualBlock(
                    width, dtype=self.dtype, name=f"layer{layer_idx + 1}_block{b}"
                )(x, train)

        x = nn.Conv(
            self.out_channels, (1, 1),
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
            name="output_conv",
        )(x)
        return x.astype(jnp.float32)
