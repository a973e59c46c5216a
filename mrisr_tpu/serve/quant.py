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
- the 4 ConvTranspose upconvs and the final 1x1 conv stay bf16 (together
  ~5% of FLOPs; quantizing them buys nothing measurable).

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
        x = _upconv(x, params[up], dtype)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _float_block(params[name], x, stats, name, dtype, stat_fn)
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


def quantize_unet(variables: Dict, calib: Dict[str, float]) -> Dict:
    """Folded fp params + calibration absmax -> int8 serving params.

    Returns a pytree: quantized double-conv blocks ({w_int8, scale, bias}
    per conv, where scale = a_scale * per-channel w_scale is the fused
    dequant factor and a_scale rides along for the input quantizer) plus
    the untouched fp upconv/final entries.
    """
    params = variables["params"]
    out: Dict = {}
    for name, sub in params.items():
        if name.startswith(("enc", "dec", "bottleneck")):
            q = {}
            for cn in ("Conv_0", "Conv_1"):
                w = jnp.asarray(sub[cn]["kernel"], jnp.float32)  # (3,3,I,O)
                w_absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # per out-ch
                w_scale = w_absmax / 127.0
                w_int8 = jnp.clip(
                    jnp.round(w / jnp.maximum(w_scale, 1e-12)), -127, 127
                ).astype(jnp.int8)
                a_scale = jnp.asarray(
                    max(calib[f"{name}/{cn}"], 1e-12) / 127.0, jnp.float32
                )
                q[cn] = {
                    "w_int8": w_int8,
                    "a_scale": a_scale,
                    "scale": (a_scale * w_scale).astype(jnp.float32),
                    "bias": jnp.asarray(sub[cn]["bias"], jnp.float32),
                }
            out[name] = q
        else:  # upconvN / final stay bf16
            out[name] = {
                k: jnp.asarray(v, jnp.bfloat16) for k, v in sub.items()
            }
    return out


def _int8_block(q, x, dtype):
    for cn in ("Conv_0", "Conv_1"):
        lq = q[cn]
        xi = jnp.clip(
            jnp.round(x.astype(jnp.float32) / lq["a_scale"]), -127, 127
        ).astype(jnp.int8)
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
