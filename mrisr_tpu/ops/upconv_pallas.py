"""Pallas TPU kernel: int8 2x2-stride-2 transposed conv as a dense matmul.

Why: the serving path's four upconvs (`serve/quant.py:_upconv_int8`) are the
reference M2 decoder's ConvTranspose(k=2, s=2) layers
(`/root/reference/src/ModelLoader.py:121-137`).  XLA lowers
``lax.conv_transpose`` by zero-dilating the input and running a full 2x2
convolution over it — 4x the useful MACs (measured 39 % useful-FLOP
efficiency in benchmarks/int8_profile.py).  With kernel == stride the op is
mathematically a per-input-pixel dense contraction

    y[n, 2h+a, 2w+b, co] = sum_c  x[n, h, w, c] * K[a, b, c, co]

i.e. one matmul  (H*W, C) @ (C, 4*Co)  per image — no wasted MACs, and the
4*Co output-lane dimension fills the 128-lane MXU even when Co is the
full-resolution level's 64 channels.  The einsum+pixel-shuffle graph-level
version of this idea measured SLOWER than conv_transpose (2,510 vs 2,652
slices/s) because the phase un-interleave materializes through HBM; here the
shuffle happens in VMEM inside the kernel's epilogue, which also fuses the
int8 requantization (dequant * per-channel scale + bias -> round -> int8),
so HBM sees exactly one int8 read of x and one int8 write of y.

Weight/scale layout is precomputed once per model by :func:`pack_upconv`
(the (2,2,C,Co) kernel becomes (C, 4*Co); per-channel scales tile 4x), so
the kernel is a pure matmul + epilogue.  Accuracy is bit-identical to the
reference lowering up to fp32 epilogue rounding order (tested against
``lax.conv_transpose`` in tests/test_upconv_pallas.py).

STATUS (measured r3, v5e + jax-of-record): Mosaic REJECTS this kernel at
compile time — the phase un-interleave is a
``vector<(H*W)x(4Co)xi8> -> vector<HxWx2x2xCoxi8>`` shape cast and
``infer-vector-layout`` reports "unsupported shape cast" (the interleave
is a sublane/lane relayout its reshape rules cannot express).  It stays an
opt-in (``upconv_impl='pallas'``) that is correct under interpret mode and
parity-tested against ``lax.conv_transpose`` (tests/test_upconv_pallas.py)
so it can be re-tried on newer Mosaic; the measured serving default is the
shared-emission conv_transpose path (docs/SERVING.md "Where the rest of
the int8 peak goes").

Usable interpreted (CPU tests) everywhere; compiled TPU use blocked as
above.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_upconv(w_int8: jax.Array, scale: jax.Array, bias: jax.Array):
    """(2, 2, C, Co) int8 kernel -> matmul operands for the Pallas kernel.

    Returns (w2, scale4, bias4): w2 is (C, 4*Co) with the last dim ordered
    (a, b, co) so the kernel's reshape (..., 2, 2, Co) recovers the phases;
    scale4/bias4 are the per-output-channel dequant factor and bias tiled
    over the 4 phases (the quantizer's w_scale is per-co over the whole
    2x2xC kernel, so all phases share it).
    """
    a2, b2, c, co = w_int8.shape
    assert (a2, b2) == (2, 2), "pack_upconv expects a 2x2 stride-2 kernel"
    # lax.conv_transpose applies the kernel spatially FLIPPED relative to
    # the output-phase index (same flip as quant.py's einsum lowering):
    # y[2h+a, 2w+b] uses K[1-a, 1-b]
    w2 = jnp.transpose(w_int8[::-1, ::-1], (2, 0, 1, 3)).reshape(c, 4 * co)
    scale4 = jnp.tile(jnp.asarray(scale, jnp.float32), 4)
    bias4 = jnp.tile(jnp.asarray(bias, jnp.float32), 4)
    return w2, scale4, bias4


def _make_kernel(hblk: int, w: int, co: int, cs: int):
    def kernel(*refs):
        if cs:
            x_ref, w_ref, s_ref, b_ref, skip_ref, out_ref = refs
        else:
            x_ref, w_ref, s_ref, b_ref, out_ref = refs
        c = x_ref.shape[-1]
        xb = x_ref[0].reshape(hblk * w, c)
        t = jnp.dot(xb, w_ref[:], preferred_element_type=jnp.int32)
        y = t.astype(jnp.float32) * s_ref[0] + b_ref[0]
        y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        # un-interleave phases in VMEM: (h, w, a, b, co) -> (2h, 2w, co)
        y = y.reshape(hblk, w, 2, 2, co)
        y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(2 * hblk, 2 * w, co)
        if cs:
            out_ref[0, :, :, :co] = y
            out_ref[0, :, :, co:] = skip_ref[0]
        else:
            out_ref[0] = y

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upconv_call(x, w2, scale4, bias4, skip, interpret: bool = False):
    n, h, w, c = x.shape
    co = w2.shape[1] // 4
    cs = 0 if skip is None else skip.shape[-1]
    # block rows so the int32 matmul temp stays ~<=2 MB of VMEM; hblk must
    # keep DIVIDING h — grid=(n, h//hblk) covers nothing past the last full
    # block, so a non-divisor would silently leave the trailing output rows
    # unwritten.  Invariant: hblk | h at loop entry (hblk starts at h), and
    # halving an EVEN divisor of h yields another divisor, so the evenness
    # check alone preserves it.
    hblk = h
    while (hblk > 8 and hblk % 2 == 0
           and hblk * w * 4 * co * 4 > 2 * 1024 * 1024):
        hblk //= 2
    grid = (n, h // hblk)
    in_specs = [
        pl.BlockSpec((1, hblk, w, c), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 4 * co), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * co), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * co), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w2, scale4[None], bias4[None]]
    if skip is not None:
        in_specs.append(
            pl.BlockSpec((1, 2 * hblk, 2 * w, cs), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(skip)
    out = pl.pallas_call(
        _make_kernel(hblk, w, co, cs),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 2 * hblk, 2 * w, co + cs), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, co + cs), jnp.int8),
        interpret=interpret,
    )(*args)
    return out


def upconv2x2_int8(
    x: jax.Array,
    w2: jax.Array,
    scale4: jax.Array,
    bias4: jax.Array,
    skip: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """int8 stride-2 2x2 transposed conv + requant epilogue (+ fused concat).

    x: (N, H, W, C) int8 codes; w2/scale4/bias4 from :func:`pack_upconv`,
    where scale4 already folds the NEXT conv's activation scale
    (scale4 = tile(w_scale * a_in / a_next)) and bias4 = tile(bias / a_next).
    skip: optional (N, 2H, 2W, Cs) int8 — written into the output's trailing
    channels, fusing the decoder's concatenate into the same HBM pass.
    Returns (N, 2H, 2W, Co[+Cs]) int8.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _upconv_call(x, w2, scale4, bias4, skip, interpret=interpret)
