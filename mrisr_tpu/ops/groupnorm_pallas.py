"""Fused single-pass Pallas TPU kernel for GroupNorm + SiLU (+ int8 emit).

Why it was built: in the Fast-DDPM sampler the GroupNorm/SiLU/quantize
elementwise chains are the measured non-conv cost — ~21 % of each forward
(docs/SERVING.md "Where the remaining 28 % goes").  GroupNorm is
data-dependent (nothing folds into the convs, unlike the UNet's
BatchNorm), and XLA lowers each site as TWO passes over the activation:
a reduce fusion that reads x to produce the group statistics, then an
elementwise fusion that reads x AGAIN to normalize/SiLU/quantize.  This
kernel keeps one (H, W, C-chunk) block resident in VMEM and does both
passes there — ONE HBM read of x and one write of the result, emitted
directly as int8 when a quantization scale is given (the following conv's
activation scale, serve/quant_diffusion.py) so the quantize costs no
extra traffic either.

Measured outcome (v5e, batch 128) — **opt-in only; the XLA path stays the
sampler default**: in isolation the kernel is **2.9x** the XLA chain
(4.87 vs 14.24 ms on the (128, 128², 128) enc2 site shape), but swapped
into the int8_deep sampler it is end-to-end SLOWER — 48.3 vs 85.6
slices/s with all deep sites fused (53.0 with only the 128² sites, 67.9
with only the <=64² ones: every subset loses).  Root cause, read from the
compiled HLO: at serving batch sizes XLA assigns the convs' activation
operands the batch-inner ``{3,0,2,1}`` layout (pixel-major, batch on
sublanes, channels on lanes) and its GN/quantize FUSIONS emit directly
into that layout for free — while a Pallas custom call is pinned to the
default ``{3,2,1,0}`` layout, so XLA materializes full-tensor transpose
copies on both sides of every fused site (~0.8 GB of copies per forward
at the 128² sites alone).  A single-pass kernel in the convs' own layout
would need all (H·W) of a batch tile resident per program —
(H, W, 16, 128) is 16 MB at 64² and 64 MB at 128² — past VMEM, so the
layout conflict is structural, the same verdict as the einsum/Pallas
upconv lowering (docs/SERVING.md).  The kernel remains correct, tested
(tests/test_groupnorm_pallas.py), and reproducible via
``benchmarks/diffusion_sampling.py --quant int8_deep --gn-impl pallas``.

Semantics match ``flax.linen.GroupNorm(num_groups, epsilon)`` followed by
``nn.silu`` (and optionally the symmetric int8 quantizer
``clip(round(y/scale), -127, 127)``): statistics in float32 over each
(sample, group) with the biased variance (flax ``use_fast_variance``
default), affine scale/bias per channel.  The whole normalize is folded
to one multiply-add per element: ``y = x * (gamma * rsqrt(var + eps)) +
(beta - mean * gamma * rsqrt(var + eps))``.

Layout: NHWC with C on the lane axis.  The grid is (B, C // 128) — a
128-channel chunk per program keeps full lanes, and group boundaries
never straddle chunks because the DiffResBlock group size is
``C / max(1, C // 4) = 4`` (`models/diffusion.py`), which divides 128.
Group statistics are assembled lane-locally: per-channel sums reduce on
the VPU, then one tiny (1, 128) @ (128, 128) matmul against a constant
block-diagonal group-averaging matrix mixes each group's channels —
layout-friendly where a lane reshape would not be.  The block is
processed in H-strips so the f32 intermediates stay small next to the
resident input block.

Eligibility (:func:`gn_pallas_eligible`) covers every GroupNorm site in
front of a :data:`~mrisr_tpu.serve.quant_diffusion.DEEP_SITES` conv at
serving resolution (<=128², C a multiple of 128); the 256² sites keep the
XLA path (their block would not fit VMEM single-pass).

The reference has no GroupNorm kernels (PyTorch eager ops throughout,
`/root/reference/notebooks/FastDDPM_Training_Fixed.ipynb:cell7`); this is
a TPU-serving addition.  No custom VJP — serving only; training keeps the
Flax module.

Usable both compiled (TPU) and interpreted (CPU tests,
tests/test_groupnorm_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128  # lane-exact channel chunk per program

# single-pass VMEM budget: the resident input block (bf16) stays <= 4 MB
_MAX_BLOCK_ELEMS = 128 * 128 * _CHUNK


def gn_pallas_eligible(shape, num_groups: int, quantized: bool = True) -> bool:
    """Whether (B, H, W, C) + num_groups fits this kernel's layout rules.

    C must be lane-chunkable (multiple of 128) with groups that never
    straddle a chunk; H strip-able; W tiling-legal for the OUTPUT dtype
    (int8 min tile is (32, 128), bf16 (16, 128)); and the per-program
    block small enough to stay VMEM-resident single-pass.
    """
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % _CHUNK or c % num_groups:
        return False
    gs = c // num_groups
    if _CHUNK % gs:
        return False
    if h % 8 or w % (32 if quantized else 16):
        return False
    return h * w * _CHUNK <= _MAX_BLOCK_ELEMS


def _group_matrix(gs: int, denom: float) -> np.ndarray:
    """(128, 128) block-diagonal group-averaging matrix: right-multiplying
    a (1, 128) per-channel sum row by it yields each channel's GROUP mean
    (sum over its gs-channel group, divided by ``denom`` = H*W*gs)."""
    g = np.zeros((_CHUNK, _CHUNK), np.float32)
    for i in range(_CHUNK):
        blk = i // gs
        g[blk * gs:(blk + 1) * gs, i] = 1.0 / denom
    return g


def _pick_strip(h: int, w: int) -> int:
    """Largest strip height in {32, 16, 8} dividing H whose f32 working set
    (strip, W, 128) stays ~<= 2 MB."""
    for strip in (32, 16, 8):
        if h % strip == 0 and strip * w * _CHUNK * 4 <= 2 * 1024 * 1024:
            return strip
    return 8


def _make_kernel(h: int, w: int, strip: int, eps: float, quantized: bool,
                 out_dtype):
    n_strips = h // strip

    def kernel(x_ref, g_ref, gamma_ref, beta_ref, *rest):
        if quantized:
            scale_ref, out_ref = rest
        else:
            (out_ref,) = rest

        # pass 1 over VMEM: per-channel sum / sum-of-squares, strip-wise so
        # the f32 temporaries stay small; (W, C) accumulators then collapse
        acc1 = jnp.zeros((w, _CHUNK), jnp.float32)
        acc2 = jnp.zeros((w, _CHUNK), jnp.float32)
        for i in range(n_strips):
            xs = x_ref[0, pl.ds(i * strip, strip), :, :].astype(jnp.float32)
            acc1 = acc1 + jnp.sum(xs, axis=0)
            acc2 = acc2 + jnp.sum(xs * xs, axis=0)
        s1 = jnp.sum(acc1, axis=0)[None, :]  # (1, C)
        s2 = jnp.sum(acc2, axis=0)[None, :]

        # tiny MXU matmul mixes each 4-channel group (see module docstring)
        mean = jnp.dot(s1, g_ref[:], preferred_element_type=jnp.float32)
        ex2 = jnp.dot(s2, g_ref[:], preferred_element_type=jnp.float32)
        var = ex2 - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        ga = gamma_ref[:].astype(jnp.float32) * inv          # (1, C)
        be = beta_ref[:].astype(jnp.float32) - mean * ga     # (1, C)
        ga3 = ga.reshape(1, 1, _CHUNK)
        be3 = be.reshape(1, 1, _CHUNK)
        if quantized:
            inv_a = 1.0 / scale_ref[0, 0]

        # pass 2 over the SAME resident block: normalize + SiLU (+ quantize)
        for i in range(n_strips):
            xs = x_ref[0, pl.ds(i * strip, strip), :, :].astype(jnp.float32)
            y = xs * ga3 + be3
            y = y * jax.nn.sigmoid(y)
            if quantized:
                q = jnp.clip(jnp.round(y * inv_a), -127.0, 127.0)
                out_ref[0, pl.ds(i * strip, strip), :, :] = q.astype(jnp.int8)
            else:
                out_ref[0, pl.ds(i * strip, strip), :, :] = y.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "out_dtype", "interpret"),
)
def _gn_silu_call(x, gamma, beta, quant_scale, *, num_groups, eps,
                  out_dtype, interpret):
    b, h, w, c = x.shape
    gs = c // num_groups
    quantized = quant_scale is not None
    strip = _pick_strip(h, w)
    g = jnp.asarray(_group_matrix(gs, float(h * w * gs)))
    kernel = _make_kernel(h, w, strip, float(eps), quantized, out_dtype)

    in_specs = [
        pl.BlockSpec((1, h, w, _CHUNK), lambda i, j: (i, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_CHUNK, _CHUNK), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _CHUNK), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _CHUNK), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, g, gamma.reshape(1, c), beta.reshape(1, c)]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(jnp.asarray(quant_scale, jnp.float32).reshape(1, 1))
        out_dtype = jnp.int8

    out = pl.pallas_call(
        kernel,
        grid=(b, c // _CHUNK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, _CHUNK), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        # the 128²-spatial block (4 MB bf16 in, double-buffered, + strip
        # temps) sits ~150 KB above the default 16 MB scoped-vmem limit;
        # v5e has headroom well past that, so raise the cap rather than
        # shrink the resident block (which is the whole point here)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out


def groupnorm_silu_pallas(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    num_groups: int,
    eps: float = 1e-5,
    quant_scale=None,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused GroupNorm + SiLU (+ symmetric int8 quantize) on NHWC.

    x: (B, H, W, C); gamma/beta: (C,) affine params.  With
    ``quant_scale`` (a scalar, traced OK — e.g. the following conv's
    per-step activation scale) the result is emitted as int8 codes
    ``clip(round(silu(gn(x)) / quant_scale), -127, 127)``; without it, as
    ``out_dtype``.  Callers gate on :func:`gn_pallas_eligible` first.
    """
    if not gn_pallas_eligible(x.shape, num_groups,
                              quantized=quant_scale is not None):
        raise ValueError(
            f"shape {x.shape} / groups {num_groups} not eligible for the "
            "fused GroupNorm kernel (see gn_pallas_eligible)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gn_silu_call(
        x, gamma, beta, quant_scale, num_groups=num_groups, eps=eps,
        out_dtype=out_dtype, interpret=interpret,
    )
