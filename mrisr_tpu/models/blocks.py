"""Shared conv blocks.

TPU notes: all convs are NHWC so the channel dim rides the 128-lane axis and
XLA tiles directly onto the MXU; BatchNorm statistics reduce over (B, H, W)
of the *global* (sharded) batch — under pjit/GSPMD the cross-chip mean is an
automatic ``psum`` over the data axis, giving SyncBN semantics for free
(SURVEY.md §7 "BatchNorm in a pjit world").

Reference blocks: UNetBlock (`/root/reference/src/ModelLoader.py:16-31`,
conv-BN-ReLU x2 with bias), ProgressiveUNetBlock / GANUNetBlock
(`:33-63`, same but bias=False).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum = 1-0.1)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x 2 — the UNet building block.

    ``use_bias=True`` matches UNetBlock (M1); ``False`` matches
    ProgressiveUNetBlock / GANUNetBlock (M3).

    ``use_bn=False`` builds the BN-FOLDED inference variant: BN's affine +
    running stats are pre-multiplied into the conv weights
    (ckpt/fold_bn.py), eliminating per-block elementwise normalization
    traffic on the serving path.  Folded convs always carry a bias.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding=1,
                use_bias=self.use_bias or not self.use_bn,
                dtype=self.dtype,
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=BN_MOMENTUM,
                    epsilon=BN_EPS, dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return x


def max_pool_2x2(x):
    """MaxPool2d(kernel_size=2, stride=2)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def max_pool_3x3_s1(x):
    """MaxPool2d(kernel_size=3, stride=1, padding=1) — DeepCNN stem
    (`/root/reference/src/ModelLoader.py:326`)."""
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class PixelShuffleUpConv(nn.Module):
    """ConvTranspose(k=2, s=2) computed as matmul + pixel shuffle.

    XLA lowers ``conv_transpose`` via input dilation: a 2x2 window over a
    zero-dilated input, so 3 of 4 MACs multiply zeros.  With kernel ==
    stride the op is exactly

        out[n, 2i+di, 2j+dj, o] = sum_c x[n, i, j, c] * W[1-di, 1-dj, c, o]

    — one dense (ci -> 4*co) matmul followed by a reshape, zero wasted MXU
    work.  Parameter shape/name identical to ``nn.ConvTranspose``
    ((2, 2, ci, co) 'kernel' + 'bias'), so checkpoints and the torch
    converter are interchangeable; equivalence is tested in
    tests/test_models.py.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, ci, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        w = kernel[::-1, ::-1].astype(self.dtype)
        y = jnp.einsum(
            "nhwc,ijco->nhiwjo", x.astype(self.dtype), w,
            preferred_element_type=self.dtype,
        )
        n, h, _, wd, _, co = y.shape
        return y.reshape(n, h * 2, wd * 2, co) + bias.astype(self.dtype)


def UpConv2x2(features: int, dtype: Any = jnp.float32, name: str | None = None,
              impl: str = "convt"):
    """ConvTranspose2d(kernel_size=2, stride=2) — exact upsampling double.

    With kernel == stride the transposed conv is non-overlapping, so both
    implementations reproduce torch's op bit-for-bit given the spatial-flip
    weight mapping (tests/test_models.py, ckpt/torch_convert.py).

    Measured on v5e (full UNet, bf16, batch 64): the lax.conv_transpose
    lowering WINS — 1220 slices/s vs 1046 for the einsum+pixel-shuffle
    formulation (the reshape/transpose traffic costs more than the dilated
    MACs it saves), so 'convt' is the default and 'pixel_shuffle' stays as
    the checkpoint-compatible alternative.  A plain factory so the parameter
    path is ``<name>/kernel`` either way.
    """
    if impl == "pixel_shuffle":
        return PixelShuffleUpConv(features, dtype=dtype, name=name)
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), padding="VALID", dtype=dtype,
        name=name,
    )


kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)
