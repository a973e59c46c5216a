"""Bilinear resize matching the reference's torchvision semantics.

The reference resizes every slice to 256x256 with
``TF.resize(..., InterpolationMode.BILINEAR)`` (antialias off for tensors) at
`/root/reference/src/ModelDataGenerator.py:204-208` and
``F.interpolate(mode='bilinear', align_corners=False)`` at
`/root/reference/src/ModelDataGenerator_ProgressiveUNet.py:187-192`.
Both use half-pixel centers (align_corners=False), which is exactly
``jax.image.resize(method='bilinear', antialias=False)``.

Golden-tested against torch CPU in tests/test_resize.py.
"""

from __future__ import annotations

from typing import Tuple

import jax


def resize_bilinear(
    x: jax.Array,
    out_hw: Tuple[int, int],
    antialias: bool = False,
) -> jax.Array:
    """Resize the trailing two spatial dims of ``x`` to ``out_hw``.

    Identity when shapes already match (the common case: native 256x256
    series), so it is free to keep in the jitted path.
    """
    h, w = out_hw
    if x.shape[-2] == h and x.shape[-1] == w:
        return x
    out_shape = (*x.shape[:-2], h, w)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=antialias)


def resize_bilinear_nhwc(
    x: jax.Array,
    out_hw: Tuple[int, int],
    antialias: bool = False,
) -> jax.Array:
    """Resize (B, H, W, C) on the H, W dims."""
    h, w = out_hw
    if x.shape[1] == h and x.shape[2] == w:
        return x
    out_shape = (x.shape[0], h, w, x.shape[3])
    return jax.image.resize(x, out_shape, method="bilinear", antialias=antialias)
