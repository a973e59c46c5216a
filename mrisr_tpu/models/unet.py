"""UNet for slice interpolation: (B, H, W, 2) -> (B, H, W, 1).

One class unifies the reference's three topologically identical UNets:
- ``UNet`` (M2, `/root/reference/src/ModelLoader.py:66-145`, bias=True) —
  the MSE / combined-loss model,
- ``UNetStage`` (M4, `:148-226`, bias=False) — one Progressive UNet stage,
- ``UNetGenerator`` (M8, `:383-463`, bias=False) — the GAN generator.

Topology: 4-level encoder 64->128->256->512 with 2x2 max-pool, bottleneck
1024, decoder via ConvTranspose(2,2) + skip concat + double conv, final
1x1 conv.  ~31 M params at 64 base features.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.blocks import DoubleConv, UpConv2x2, max_pool_2x2


class UNet(nn.Module):
    out_channels: int = 1
    features: int = 64
    use_bias: bool = True
    dtype: Any = jnp.float32
    # False -> BN-folded inference topology (see ckpt/fold_bn.py)
    use_bn: bool = True
    # rematerialize each double-conv in backward: activation memory of the
    # block drops to its inputs, at ~1/3 extra forward FLOPs — lets training
    # batches past the non-remat HBM ceiling (measured: ARCHITECTURE.md)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        # static_argnums=(2,): (0=module, 1=x, 2=train) — train selects the
        # BN branch and must stay a Python bool under nn.remat
        block = (
            nn.remat(DoubleConv, static_argnums=(2,)) if self.remat
            else DoubleConv
        )
        dc = lambda feat, name: block(  # noqa: E731
            feat, use_bias=self.use_bias, dtype=self.dtype, name=name,
            use_bn=self.use_bn,
        )

        enc1 = dc(f, "enc1")(x, train)
        x = max_pool_2x2(enc1)
        enc2 = dc(f * 2, "enc2")(x, train)
        x = max_pool_2x2(enc2)
        enc3 = dc(f * 4, "enc3")(x, train)
        x = max_pool_2x2(enc3)
        enc4 = dc(f * 8, "enc4")(x, train)
        x = max_pool_2x2(enc4)

        x = dc(f * 16, "bottleneck")(x, train)

        x = UpConv2x2(f * 8, dtype=self.dtype, name="upconv4")(x)
        x = jnp.concatenate([x, enc4], axis=-1)
        x = dc(f * 8, "dec4")(x, train)

        x = UpConv2x2(f * 4, dtype=self.dtype, name="upconv3")(x)
        x = jnp.concatenate([x, enc3], axis=-1)
        x = dc(f * 4, "dec3")(x, train)

        x = UpConv2x2(f * 2, dtype=self.dtype, name="upconv2")(x)
        x = jnp.concatenate([x, enc2], axis=-1)
        x = dc(f * 2, "dec2")(x, train)

        x = UpConv2x2(f, dtype=self.dtype, name="upconv1")(x)
        x = jnp.concatenate([x, enc1], axis=-1)
        x = dc(f, "dec1")(x, train)

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="final")(x)
        return x.astype(jnp.float32)
