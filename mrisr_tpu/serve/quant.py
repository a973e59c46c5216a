"""Post-training int8 quantization of the UNet serving path.

Why: the bf16 single-chip roofline for the exact M2 topology is ~2.1k
256² slices/s (BASELINE.md "Roofline") — below the 5k north-star.  TPU
v5e's MXU runs int8 at 2x the bf16 rate (394 TOPS), so an int8 forward is
the only single-chip path that can pass the bf16 ceiling without changing
the topology.  This module is that opt-in path, with the measured accuracy
cost reported next to the speed (r1 verdict item 2).

Scheme (standard symmetric post-training quantization):
- operates on the BN-FOLDED params (ckpt/fold_bn.py) — BN is already inside
  the conv weights, so each of the 18 3x3 convs is conv+bias+ReLU;
- weights: per-output-channel symmetric int8 (absmax / 127);
- activations: per-layer static symmetric scale, calibrated as the absmax
  of each conv's input over calibration batches (:func:`calibrate_unet`);
- conv accumulates int8 x int8 -> int32 on the MXU
  (``preferred_element_type=jnp.int32``; worst-case |acc| for a 3x3x1024
  input is 127*127*9*1024 ≈ 1.5e8, well inside int32);
- dequantize with the fused ``a_scale * w_scale`` per-channel factor, add
  bias, ReLU — all elementwise, fused by XLA into the conv epilogue;
- the 4 ConvTranspose upconvs and the final 1x1 conv are ALSO quantized
  (since r3): with kernel == stride the transposed conv is a dense matmul
  and quantizes like any conv, and emitting the decoder tensors as int8
  removes the last bf16 activations from HBM.  Old calibration dicts
  without upconv/final entries still load — those layers then stay bf16
  (both weight forms are stored, so serving bundles are forward/backward
  compatible).

The reference has no quantization anywhere (pure fp32 PyTorch,
`/root/reference/src/ModelLoader.py`); this is a TPU-serving addition.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_DN = ("NHWC", "HWIO", "NHWC")
_BLOCKS_DOWN = ("enc1", "enc2", "enc3", "enc4")
_BLOCKS_UP = ("dec4", "dec3", "dec2", "dec1")


def _require_folded_unet(params: Dict, who: str) -> None:
    """Reject trees that are not a BN-FOLDED UNet.

    Quantizing an UNFOLDED tree silently drops BatchNorm (these walkers
    only read Conv_0/Conv_1), producing a wrong-but-finite forward — the
    worst failure mode for a serving path."""
    if "enc1" not in params:
        raise ValueError(
            f"{who} expects the UNet-family topology (enc*/dec*/bottleneck "
            "blocks); got keys " + str(sorted(params)[:6])
        )
    for name, sub in params.items():
        if isinstance(sub, dict) and "BatchNorm_0" in sub:
            raise ValueError(
                f"{who} expects a BN-FOLDED tree (ckpt/fold_bn.py) but "
                f"{name!r} still contains BatchNorm params — fold first "
                "(api.load_model(..., fold_bn=True))"
            )


def _conv3x3(x, kernel, *, preferred=None):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=preferred,
    )


def _upconv(x, sub, dtype):
    y = jax.lax.conv_transpose(
        x.astype(dtype), sub["kernel"].astype(dtype), (2, 2), "VALID",
        dimension_numbers=_DN,
    )
    return y + sub["bias"].astype(dtype)


def _float_block(sub, x, stats: Dict[str, jax.Array], name: str, dtype,
                 stat_fn):
    """Folded double-conv block in float, recording each conv-input range."""
    for cn in ("Conv_0", "Conv_1"):
        stats[f"{name}/{cn}"] = stat_fn(x)
        w = sub[cn]["kernel"].astype(dtype)
        x = _conv3x3(x.astype(dtype), w) + sub[cn]["bias"].astype(dtype)
        x = nn.relu(x)
    return x


def _unet_float_with_stats(params: Dict, x: jax.Array, dtype=jnp.bfloat16,
                           percentile=None):
    """Forward of the folded UNet recording per-conv input range.

    Mirrors models/unet.py exactly (tested equal); returns (y, stats).
    ``percentile=None`` records absmax; a value (e.g. 99.9) records that
    percentile of |x| — clipping the outlier tail spends the 127 int8 codes
    on the bulk of the distribution instead of one extreme activation."""
    if percentile is None:
        stat_fn = lambda a: jnp.max(jnp.abs(a)).astype(jnp.float32)  # noqa: E731
    else:
        stat_fn = lambda a: jnp.percentile(  # noqa: E731
            jnp.abs(a).astype(jnp.float32).reshape(-1), percentile
        )
    stats: Dict[str, jax.Array] = {}
    skips = []
    for name in _BLOCKS_DOWN:
        x = _float_block(params[name], x, stats, name, dtype, stat_fn)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    x = _float_block(params["bottleneck"], x, stats, "bottleneck", dtype,
                     stat_fn)
    for name, skip in zip(_BLOCKS_UP, reversed(skips)):
        up = f"upconv{name[-1]}"
        stats[up] = stat_fn(x)
        x = _upconv(x, params[up], dtype)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _float_block(params[name], x, stats, name, dtype, stat_fn)
    stats["final"] = stat_fn(x)
    x = _conv3x3(x.astype(dtype), params["final"]["kernel"].astype(dtype))
    x = x + params["final"]["bias"].astype(dtype)
    return x.astype(jnp.float32), stats


def calibrate_unet(
    variables: Dict, batches: List[jax.Array], dtype=jnp.bfloat16,
    percentile=None,
) -> Dict[str, float]:
    """Per-conv-input absmax (or |x| percentile) over calibration batches.

    variables: FOLDED tree ({'params': ...} from fold_unet_batchnorm).
    batches: list of (B, H, W, 2) inputs (a handful is enough).
    percentile: None = absmax (safe default); e.g. 99.9 clips the
    activation outlier tail, usually a smaller SSIM delta — measure with
    benchmarks/int8_accuracy.py before serving either way.
    """
    _require_folded_unet(variables["params"], "calibrate_unet")
    fwd = jax.jit(
        lambda p, x: _unet_float_with_stats(
            p, x, dtype=dtype, percentile=percentile)[1]
    )
    acc: Dict[str, float] = {}
    for b in batches:
        stats = jax.device_get(fwd(variables["params"], b))
        for k, v in stats.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return acc


def _quantize_conv(kernel, bias, a_absmax: float) -> Dict:
    """Symmetric per-output-channel weight + per-layer activation tables."""
    w = jnp.asarray(kernel, jnp.float32)  # (..., I, O)
    w_absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    w_scale = w_absmax / 127.0
    w_int8 = jnp.clip(
        jnp.round(w / jnp.maximum(w_scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    a_scale = jnp.asarray(max(a_absmax, 1e-12) / 127.0, jnp.float32)
    return {
        "w_int8": w_int8,
        "a_scale": a_scale,
        "scale": (a_scale * w_scale).astype(jnp.float32),
        "bias": jnp.asarray(bias, jnp.float32),
    }


def quantize_unet(variables: Dict, calib: Dict[str, float]) -> Dict:
    """Folded fp params + calibration absmax -> int8 serving params.

    Returns a pytree: quantized double-conv blocks ({w_int8, scale, bias}
    per conv, where scale = a_scale * per-channel w_scale is the fused
    dequant factor and a_scale rides along for the input quantizer).  The
    upconv/final entries keep their bf16 kernel/bias (for the plain path
    and old bundles) and — when the calibration dict has their input
    ranges (r3 calibrations do) — additionally carry int8 tables so the
    fused path runs the WHOLE network on the int8 MXU rate.
    """
    params = variables["params"]
    _require_folded_unet(params, "quantize_unet")
    out: Dict = {}
    for name, sub in params.items():
        if name.startswith(("enc", "dec", "bottleneck")):
            out[name] = {
                cn: _quantize_conv(
                    sub[cn]["kernel"], sub[cn]["bias"], calib[f"{name}/{cn}"]
                )
                for cn in ("Conv_0", "Conv_1")
            }
        else:  # upconvN / final: bf16 form always, int8 tables when calibrated
            ent = {k: jnp.asarray(v, jnp.bfloat16) for k, v in sub.items()}
            if name in calib:
                ent.update(_quantize_conv(
                    sub["kernel"], sub["bias"], calib[name]
                ))
                # bf16 'bias' stays for the plain path; int8 epilogues read
                # the fp32 copy written by _quantize_conv
                ent["bias"] = jnp.asarray(sub["bias"], jnp.bfloat16)
                ent["qbias"] = jnp.asarray(sub["bias"], jnp.float32)
            out[name] = ent
    return out


def _requant_epilogue(y_i32, lq, a_next, *, relu=True, in_ratio=None):
    """Fused conv epilogue: dequant + bias + ReLU + requantize to the NEXT
    conv's activation scale, emitting int8 directly.

    XLA fuses this whole chain into the conv's output loop, so the tensor
    written to HBM is int8 — half the bytes of the bf16 activations the
    plain path materializes between convs (see :func:`unet_int8_fused_apply`).

    ``in_ratio``: when the conv's int8 input codes were emitted at a scale
    OTHER than the calibrated one (skip_emit='shared'), the actual/calibrated
    scale ratio rides into the dequant factor here — exact, since the
    dequant is linear in the input scale.
    """
    s = lq["scale"] / a_next  # (O,) fp32, folded at trace time
    if in_ratio is not None:
        s = s * in_ratio
    b = lq["bias"] / a_next
    y = y_i32.astype(jnp.float32) * s + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _float_epilogue(y_i32, lq, dtype, *, relu=True):
    y = y_i32.astype(jnp.float32) * lq["scale"] + lq["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def _quant_input(x, a_scale):
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
    ).astype(jnp.int8)


def _upconv_int8(xi, ent, a_next, impl: str = "convt", skip=None):
    """int8 ConvTranspose(k=2, s=2) + requantizing epilogue -> int8.

    With kernel == stride the transposed conv is non-overlapping — a dense
    (ci -> 4co) contraction per input pixel — so it runs on the MXU at the
    int8 rate like any matmul; the epilogue dequantizes (per-out-channel),
    adds bias and re-emits int8 at the following conv's activation scale
    (no ReLU: the reference concatenates the raw upconv output,
    /root/reference/src/ModelLoader.py:121-137).

    Three lowerings, measured on v5e at batch 128 (full int8_fused
    program): 'convt' (lax.conv_transpose) 2,652 slices/s — XLA's dilated
    lowering executes 4x the useful MACs; 'einsum' (dense contraction +
    pixel shuffle, models/blocks.py weight mapping) 2,510 — kills the
    dilation waste but the phase un-interleave materializes through HBM;
    'pallas' (ops/upconv_pallas.py) does the dense contraction with the
    phase shuffle, requant epilogue AND the decoder concatenate (``skip``)
    fused in VMEM.  ``skip`` is only honored by 'pallas'; other impls
    ignore it and the caller concatenates.
    """
    s = ent["scale"] / a_next          # (O,) fp32
    b = ent["qbias"] / a_next
    if impl == "pallas":
        from mrisr_tpu.ops.upconv_pallas import pack_upconv, upconv2x2_int8

        w2, s4, b4 = pack_upconv(ent["w_int8"], s, b)
        return upconv2x2_int8(xi, w2, s4, b4, skip=skip)
    if impl == "convt":
        y = jax.lax.conv_transpose(
            xi, ent["w_int8"], (2, 2), "VALID", dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * s + b
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    w = ent["w_int8"][::-1, ::-1]      # (2, 2, I, O) spatial flip
    y = jnp.einsum(
        "nhwc,ijco->nhiwjo", xi, w, preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * s + b
    y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    n, h, _, wd, _, co = y.shape
    return y.reshape(n, h * 2, wd * 2, co)


# Serving-wide default lowering variants for the fused path, resolved at
# trace time: every caller that doesn't pass upconv_impl/skip_emit
# (bench.py default, serve/engine.py, serve/bundle.py) picks these up.
# Measured on v5e batch 128 (benchmarks/int8_variants.py, docs/SERVING.md):
# skip_emit 'shared' 2,831 slices/s vs 'dual' 2,690 (+5.3%), SSIM delta
# +0.0004 vs dual on the demo checkpoint (benchmarks/int8_accuracy.py) —
# so 'shared' is the default; upconv 'pallas' is opt-in (ops/upconv_pallas.py).
def _default_variants() -> Tuple[str, str]:
    return ("convt", "shared")


def _has_full_tables(qparams: Dict) -> bool:
    """Whether the decoder's upconv/final int8 tables exist (r3
    calibrations) — the single completeness criterion shared by
    :func:`resolve_variants` and :func:`unet_int8_fused_apply` so what
    bench.py reports never drifts from what the apply fn executes."""
    return all(
        "w_int8" in qparams[k] for k in ("upconv4", "upconv3", "upconv2",
                                         "upconv1", "final")
    )


def resolve_variants(qparams: Dict, upconv_impl: str | None = None,
                     skip_emit: str | None = None) -> Tuple[str, str]:
    """The (upconv_impl, skip_emit) pair :func:`unet_int8_fused_apply` will
    actually execute for these tables — the single source of truth for
    callers that record/report the variants (bench.py), so a legacy
    (pre-r3) table that silently degrades a DEFAULT 'shared' to 'dual' is
    reported as what it ran, not as the default."""
    d_impl, d_emit = _default_variants()
    return (
        upconv_impl or d_impl,
        skip_emit or (d_emit if _has_full_tables(qparams) else "dual"),
    )


def unet_int8_fused_apply(qparams: Dict, x: jax.Array, dtype=jnp.bfloat16,
                          upconv_impl: str | None = None,
                          skip_emit: str | None = None):
    """int8 UNet forward with int8-RESIDENT activations.

    Same quantization tables as :func:`unet_int8_apply` (build with
    :func:`quantize_unet`), same topology (models/unet.py, M2) — but every
    inter-conv activation that the plain path round-trips through bf16 is
    instead requantized inside the conv epilogue and stays int8 in HBM:

    - within each double-conv block, Conv_0's output is emitted int8 at
      Conv_1's calibrated activation scale;
    - each encoder block output is emitted TWICE from one conv result —
      int8 at the next block's Conv_0 scale (max-pool commutes with the
      monotonic quantizer, so pooling runs on int8 codes) and int8 at the
      matching decoder Conv_0 scale for the skip connection.  Two int8
      tensors cost the same HBM bytes as the one bf16 tensor they replace;
    - when the upconv/final int8 tables exist (r3 calibrations), the
      ConvTranspose upconvs and the final 1x1 conv ALSO run int8 on the
      MXU, and the decoder's inter-layer tensors stay int8 end to end —
      only the network input and output are float.  With tables from an
      old (pre-r3) calibration those layers fall back to bf16 exactly as
      the r2 path did.

    Accuracy: same scheme as the plain path — the requantize rounds the
    fp32 epilogue value instead of a bf16-rounded copy, so the fused path
    is, if anything, slightly closer to float (tested).

    ``skip_emit``: 'dual' emits every encoder output twice (one int8
    tensor per consumer scale); 'shared' (the measured default, see
    :func:`_default_variants`) emits ONCE at
    max(dec_scale, next_enc_scale) and folds the exact actual/calibrated
    ratio into each consumer's dequant — halving the encoder's activation
    writes at a bounded coding-granularity cost (measure with
    benchmarks/int8_accuracy.py).  Requires the full r3 tables.

    Both default to :func:`_default_variants` (the measured best for the
    current backend) when None.
    """
    full = _has_full_tables(qparams)
    if upconv_impl is None or skip_emit is None:
        # a DEFAULT 'shared' silently degrades to 'dual' on legacy (pre-r3)
        # tables, which cannot express the shared emission; an EXPLICIT
        # skip_emit='shared' on such tables still raises below
        upconv_impl, skip_emit = resolve_variants(
            qparams, upconv_impl, skip_emit
        )
    a = {
        f"{blk}/{cn}": qparams[blk][cn]["a_scale"]
        for blk in (*_BLOCKS_DOWN, "bottleneck", *_BLOCKS_UP)
        for cn in ("Conv_0", "Conv_1")
    }
    shared = skip_emit == "shared"
    if shared and not full:
        raise ValueError(
            "skip_emit='shared' needs the full int8 tables (r3 calibration "
            "with upconv/final entries)"
        )

    skips = []        # int8 skip tensors
    skip_scales = []  # the scale each skip's codes were actually emitted at
    xi = _quant_input(x, a["enc1/Conv_0"])
    in_ratio = None   # actual/calibrated scale ratio of xi's codes
    for i, name in enumerate(_BLOCKS_DOWN):
        q = qparams[name]
        y0 = _conv3x3(xi, q["Conv_0"]["w_int8"], preferred=jnp.int32)
        xi = _requant_epilogue(y0, q["Conv_0"], a[f"{name}/Conv_1"],
                               in_ratio=in_ratio)
        y1 = _conv3x3(xi, q["Conv_1"]["w_int8"], preferred=jnp.int32)
        nxt = _BLOCKS_DOWN[i + 1] if i + 1 < len(_BLOCKS_DOWN) else "bottleneck"
        a_dec = a[f"dec{i + 1}/Conv_0"]
        a_nxt = a[f"{nxt}/Conv_0"]
        if shared:
            # ONE emission at a shared scale instead of two tensors at the
            # two consumers' scales — halves the encoder's activation
            # writes; the max() guarantees neither consumer's calibrated
            # range clips, and each consumer's epilogue folds the exact
            # actual/calibrated ratio (max precision loss = the ratio)
            s_sh = jnp.maximum(a_dec, a_nxt)
            t = _requant_epilogue(y1, q["Conv_1"], s_sh)
            skips.append(t)
            skip_scales.append(s_sh)
            xi = nn.max_pool(t, (2, 2), strides=(2, 2))
            in_ratio = s_sh / a_nxt
        else:
            skips.append(_requant_epilogue(y1, q["Conv_1"], a_dec))
            skip_scales.append(a_dec)
            xi = _requant_epilogue(y1, q["Conv_1"], a_nxt)
            xi = nn.max_pool(xi, (2, 2), strides=(2, 2))
            in_ratio = None

    q = qparams["bottleneck"]
    y0 = _conv3x3(xi, q["Conv_0"]["w_int8"], preferred=jnp.int32)
    xi = _requant_epilogue(y0, q["Conv_0"], a["bottleneck/Conv_1"],
                           in_ratio=in_ratio)
    y1 = _conv3x3(xi, q["Conv_1"]["w_int8"], preferred=jnp.int32)

    if full:
        # decoder entirely int8: bottleneck emits at upconv4's input scale
        xi = _requant_epilogue(y1, q["Conv_1"], qparams["upconv4"]["a_scale"])
        for name, skip, s_sh in zip(_BLOCKS_UP, reversed(skips),
                                    reversed(skip_scales)):
            q = qparams[name]
            # the upconv emits at the skip's ACTUAL scale so the concat is
            # uniformly scaled for Conv_0 (in dual mode s_sh is exactly
            # the calibrated a[name/Conv_0])
            if upconv_impl == "pallas":
                # concat fused into the kernel's output write
                xi = _upconv_int8(
                    xi, qparams[f"upconv{name[-1]}"],
                    s_sh, impl=upconv_impl, skip=skip,
                )
            else:
                xi = jnp.concatenate(
                    [
                        _upconv_int8(
                            xi, qparams[f"upconv{name[-1]}"],
                            s_sh, impl=upconv_impl,
                        ),
                        skip,
                    ],
                    axis=-1,
                )
            ratio0 = (s_sh / a[f"{name}/Conv_0"]) if shared else None
            y0 = _conv3x3(xi, q["Conv_0"]["w_int8"], preferred=jnp.int32)
            xi = _requant_epilogue(y0, q["Conv_0"], a[f"{name}/Conv_1"],
                                   in_ratio=ratio0)
            y1 = _conv3x3(xi, q["Conv_1"]["w_int8"], preferred=jnp.int32)
            if name == "dec1":
                xi = _requant_epilogue(
                    y1, q["Conv_1"], qparams["final"]["a_scale"]
                )
            else:
                nxt_up = qparams[f"upconv{int(name[-1]) - 1}"]
                xi = _requant_epilogue(y1, q["Conv_1"], nxt_up["a_scale"])
        f = qparams["final"]
        yf = _conv3x3(xi, f["w_int8"], preferred=jnp.int32)
        return yf.astype(jnp.float32) * f["scale"] + f["qbias"]

    xf = _float_epilogue(y1, q["Conv_1"], dtype)  # bf16 for the upconv
    for name, skip in zip(_BLOCKS_UP, reversed(skips)):
        q = qparams[name]
        up = _upconv(xf, qparams[f"upconv{name[-1]}"], dtype)
        xi = jnp.concatenate(
            [_quant_input(up, a[f"{name}/Conv_0"]), skip], axis=-1
        )
        y0 = _conv3x3(xi, q["Conv_0"]["w_int8"], preferred=jnp.int32)
        xi = _requant_epilogue(y0, q["Conv_0"], a[f"{name}/Conv_1"])
        y1 = _conv3x3(xi, q["Conv_1"]["w_int8"], preferred=jnp.int32)
        xf = _float_epilogue(y1, q["Conv_1"], dtype)

    y = _conv3x3(xf, qparams["final"]["kernel"].astype(dtype))
    y = y + qparams["final"]["bias"].astype(dtype)
    return y.astype(jnp.float32)


def _int8_block(q, x, dtype):
    for cn in ("Conv_0", "Conv_1"):
        lq = q[cn]
        xi = _quant_input(x, lq["a_scale"])
        y = _conv3x3(xi, lq["w_int8"], preferred=jnp.int32)
        x = y.astype(jnp.float32) * lq["scale"] + lq["bias"]
        x = nn.relu(x).astype(dtype)
    return x


def unet_int8_apply(qparams: Dict, x: jax.Array, dtype=jnp.bfloat16):
    """int8 UNet forward: (B, H, W, 2) -> (B, H, W, 1), same topology as
    models/unet.py (M2)."""
    skips = []
    for name in _BLOCKS_DOWN:
        x = _int8_block(qparams[name], x, dtype)
        skips.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    x = _int8_block(qparams["bottleneck"], x, dtype)
    for name, skip in zip(_BLOCKS_UP, reversed(skips)):
        x = _upconv(x, qparams[f"upconv{name[-1]}"], dtype)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _int8_block(qparams[name], x, dtype)
    x = _conv3x3(x.astype(dtype), qparams["final"]["kernel"].astype(dtype))
    x = x + qparams["final"]["bias"].astype(dtype)
    return x.astype(jnp.float32)
