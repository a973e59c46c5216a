"""Per-slice normalization ops.

The reference z-scores every slice independently:
``(x - x.mean()) / (x.std() + 1e-6)`` with population (ddof=0) std
(`/root/reference/src/ModelDataGenerator.py:73-75`, numpy arrays).  The
reference recomputes this for every slice of a volume on every __getitem__
(its biggest data-path inefficiency, SURVEY.md §3.1); here it is a single
vectorized device op applied once per volume / batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ZSCORE_EPS = 1e-6


def zscore_slices(x: jax.Array, eps: float = ZSCORE_EPS) -> jax.Array:
    """Z-score each slice over its trailing two (H, W) dims.

    Works for any leading shape: (H, W), (Z, H, W), (B, Z, H, W), ...
    Statistics are computed in float32 regardless of input dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
    # population std, matching numpy's default ddof=0
    var = jnp.mean(jnp.square(xf - mean), axis=(-2, -1), keepdims=True)
    return (xf - mean) / (jnp.sqrt(var) + eps)


def slice_stats(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Return per-slice (mean, std) over trailing two dims (population std)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1))
    var = jnp.mean(
        jnp.square(xf - mean[..., None, None]), axis=(-2, -1)
    )
    return mean, jnp.sqrt(var)


def minmax_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Min-max normalize each image over trailing two dims to [0, 1].

    Matches the per-image normalization the reference applies before SSIM/PSNR
    in the FastDDPM eval (`notebooks/FastDDPM_Training_Fixed.ipynb:cell21`).
    """
    xf = x.astype(jnp.float32)
    lo = jnp.min(xf, axis=(-2, -1), keepdims=True)
    hi = jnp.max(xf, axis=(-2, -1), keepdims=True)
    return (xf - lo) / (hi - lo + eps)
