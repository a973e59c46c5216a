"""Inference-time BatchNorm folding for the UNet family.

Serving optimization: with running statistics fixed, BN is an affine map
per channel and can be pre-multiplied into the preceding conv —

    y = scale * (conv(x) + b - mean) / sqrt(var + eps) + bias
      = conv'(x) + b'      with   w' = w * s,  b' = (b - mean) * s + bias,
                                  s  = scale / sqrt(var + eps)

The folded tree loads into ``UNet(use_bn=False)``; numeric equivalence is
asserted in tests/test_fold_bn.py.

Measured on v5e: throughput-neutral (1221 vs 1220 slices/s) — XLA already
fuses the eval-mode BN affine into the conv epilogue, so folding buys
simplicity (a conv-only serving graph, fewer params to ship), not speed.
Kept because exported/serving graphs benefit and it documents the fusion
fact.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mrisr_tpu.models.blocks import BN_EPS


def _fold_conv(conv: Dict, bn_params: Dict, bn_stats: Dict) -> Dict:
    w = np.asarray(conv["kernel"], np.float64)          # (kh, kw, I, O)
    b = np.asarray(conv.get("bias", np.zeros(w.shape[-1])), np.float64)
    scale = np.asarray(bn_params["scale"], np.float64)
    bias = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    s = scale / np.sqrt(var + BN_EPS)
    # device arrays, not numpy: numpy leaves would be re-uploaded on every
    # jitted call (measured 13x slower through the TPU tunnel)
    return {
        "kernel": jnp.asarray((w * s).astype(np.float32)),
        "bias": jnp.asarray(((b - mean) * s + bias).astype(np.float32)),
    }


def fold_unet_batchnorm(params: Dict, batch_stats: Dict) -> Dict:
    """Fold a UNet(use_bn=True) variables tree into UNet(use_bn=False)
    params.  Works for both biased (M2) and bias-free (M4/M8) UNets."""
    out: Dict = {}
    for name, sub in params.items():
        if name.startswith(("enc", "dec", "bottleneck")):
            folded = {}
            for conv_name, bn_name in (
                ("Conv_0", "BatchNorm_0"), ("Conv_1", "BatchNorm_1"),
            ):
                folded[conv_name] = _fold_conv(
                    sub[conv_name], sub[bn_name], batch_stats[name][bn_name]
                )
            out[name] = folded
        else:  # upconvN / final: no BN attached
            out[name] = {k: jnp.asarray(v) for k, v in sub.items()}
    return {"params": out}
