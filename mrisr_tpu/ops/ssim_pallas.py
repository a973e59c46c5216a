"""Fused single-pass Pallas TPU kernel for mean-SSIM.

The XLA path (ops/ssim.py) materializes five moment maps via ten separable
convolutions, each a round-trip through HBM when images are large or XLA
declines to fuse.  This kernel keeps one (H, W) slice pair resident in VMEM
and computes all five windowed moments with shifted-add accumulation on the
VPU, writing a single scalar per image — one HBM read of x and y, one scalar
write.  Semantics identical to skimage ``structural_similarity`` defaults
(7x7 uniform window, sample covariance, crop win//2 border); see ops/ssim.py
for the contract and tests/test_ssim.py for the golden check.

Measured on this machine's v5e (benchmarks/ssim_pallas_bench.py, batch 64,
scan 20): XLA path 16,040 images/s vs Pallas 31,631 images/s — **1.97x** —
so eval metrics (eval/metrics.py) auto-select this kernel on TPU.  Losses
keep the XLA path (this kernel defines no custom VJP).

Usable both compiled (TPU) and interpreted (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(h: int, w: int, win: int, data_range: float, k1: float, k2: float):
    vh = h - win + 1
    vw = w - win + 1
    inv = 1.0 / float(win * win)
    np_ = float(win * win)
    cov_norm = np_ / (np_ - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def _filt(a):
        # VALID uniform filter via shifted-add: rows (sublane axis) first.
        acc = a[0:vh, :]
        for d in range(1, win):
            acc = acc + a[d : d + vh, :]
        # then columns (lane axis)
        acc2 = acc[:, 0:vw]
        for d in range(1, win):
            acc2 = acc2 + acc[:, d : d + vw]
        return acc2 * inv

    def kernel(x_ref, y_ref, out_ref):
        i = pl.program_id(0)
        x = x_ref[0].astype(jnp.float32)
        y = y_ref[0].astype(jnp.float32)

        ux = _filt(x)
        uy = _filt(y)
        uxx = _filt(x * x)
        uyy = _filt(y * y)
        uxy = _filt(x * y)

        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)

        s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
            (ux * ux + uy * uy + c1) * (vx + vy + c2)
        )
        # TPU stores must be vector-shaped and tiling-legal: the output is
        # (N, 128) with the whole array as the block; each program writes
        # its 128-lane row with the broadcast mean (callers read lane 0)
        mean = jnp.sum(s) * (1.0 / float(vh * vw))
        out_ref[i, :] = jnp.full((128,), mean, jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("data_range", "win_size", "k1", "k2", "interpret")
)
def _ssim_pallas_batched(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    interpret: bool = False,
) -> jax.Array:
    n, h, w = x.shape
    kernel = _make_kernel(h, w, win_size, data_range, k1, k2)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=interpret,
    )(x, y)
    return out[:, 0]


def ssim_pallas(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    interpret: bool | None = None,
) -> jax.Array:
    """Mean SSIM per image, fused Pallas path: (..., H, W) -> (...)."""
    assert x.shape == y.shape
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xf = jnp.asarray(x, jnp.float32).reshape(-1, h, w)
    yf = jnp.asarray(y, jnp.float32).reshape(-1, h, w)
    out = _ssim_pallas_batched(
        xf, yf, data_range=data_range, win_size=win_size, k1=k1, k2=k2,
        interpret=interpret,
    )
    return out.reshape(lead)
