"""Device-side, jittable paired augmentation.

The reference augments on the host inside DataLoader workers:
- p=0.5 horizontal + p=0.5 vertical flip applied identically to pre/post/target
  (`/root/reference/src/ModelDataGenerator.py:97-115`),
- additionally random rot90*k for the progressive pipeline
  (`/root/reference/src/ModelDataGenerator_ProgressiveUNet.py:200-215`),
- a lost variant added ±5° rotations (reference README.md:60).

TPU-first redesign: augmentation is a pure function of (batch, rng key),
vectorized over the batch and fused by XLA into the forward pass — no host
work, no worker RNG state.  All channels of one sample share the same draw,
preserving the "paired" property.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot90_all(x: jax.Array):
    """All four rot90 variants of an NHWC batch (requires H == W)."""
    r1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)   # 90° CCW (np.rot90 k=1)
    r2 = jnp.flip(jnp.flip(x, axis=1), axis=2)      # 180°
    r3 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)    # 270°
    return x, r1, r2, r3


def paired_augment(
    key: jax.Array,
    batch: jax.Array,
    hflip: bool = True,
    vflip: bool = True,
    rot90: bool = False,
    rotate_degrees: float = 0.0,
) -> jax.Array:
    """Apply per-sample paired augmentation to an NHWC batch.

    batch: (B, H, W, C) — every channel of a sample gets the same transform.
    """
    b = batch.shape[0]
    k_h, k_v, k_r, k_a = jax.random.split(key, 4)

    if hflip:
        flip = jax.random.bernoulli(k_h, 0.5, (b,))
        batch = jnp.where(flip[:, None, None, None], jnp.flip(batch, axis=2), batch)
    if vflip:
        flip = jax.random.bernoulli(k_v, 0.5, (b,))
        batch = jnp.where(flip[:, None, None, None], jnp.flip(batch, axis=1), batch)
    if rot90:
        k = jax.random.randint(k_r, (b,), 0, 4)
        r0, r1, r2, r3 = _rot90_all(batch)
        sel = k[:, None, None, None]
        batch = jnp.where(
            sel == 0, r0, jnp.where(sel == 1, r1, jnp.where(sel == 2, r2, r3))
        )
    if rotate_degrees > 0.0:
        angles = jax.random.uniform(
            k_a, (b,), minval=-rotate_degrees, maxval=rotate_degrees
        ) * (jnp.pi / 180.0)
        batch = _rotate_bilinear(batch, angles)
    return batch


def _rotate_bilinear(batch: jax.Array, angles: jax.Array) -> jax.Array:
    """Batched small-angle rotation about the image center, bilinear, zero fill.

    (The reference's rotation variant's exact interpolation is lost with its
    notebook; bilinear + zero fill is the documented choice here.)
    """
    _, h, w, _ = batch.shape
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")  # (H, W)

    def rot_one(img, theta):
        # inverse mapping: sample source coords for each output pixel
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        sy = cos * gy - sin * gx + (h - 1) / 2.0
        sx = sin * gy + cos * gx + (w - 1) / 2.0
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = sy - y0
        wx = sx - x0

        def gather(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            vals = img[yc, xc, :]  # (H, W, C)
            return jnp.where(inb[..., None], vals, 0.0)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
        bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
        return top * (1 - wy)[..., None] + bot * wy[..., None]

    return jax.vmap(rot_one)(batch, angles)
