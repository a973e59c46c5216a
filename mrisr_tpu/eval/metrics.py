"""Metric computation with the reference's exact normalization semantics.

Three distinct normalization conventions exist in the reference and all are
reproduced (they give different numbers — SSIM is the acceptance metric, so
the convention matters):

- :func:`compute_metrics` (V6, `/root/reference/src/VolumeVisualization.py:237-269`):
  volume-level; BOTH volumes normalized by the ORIGINAL volume's min/max
  range, prediction clipped to [0, 1], per-slice SSIM + PSNR with
  data_range=1, plus MAE.  Used by all volume-level evaluations.
- :func:`per_sample_metrics` ``mode='minmax-each'`` (V11,
  `notebooks/FastDDPM_Training_Fixed.ipynb:cell21`): each gt/pred image
  min-max normalized INDEPENDENTLY.  Used by the FastDDPM test eval.
- ``mode='denorm-11'`` (`FastDDPM_Training_v3.ipynb:cell17`):
  [-1, 1] -> [0, 1] denormalization before SSIM/PSNR.

All SSIM values match skimage defaults (ops/ssim.py golden tests).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.ops.ssim import psnr as psnr_op, ssim as ssim_op
from mrisr_tpu.ops.stats import minmax_normalize


def _auto_pallas(use_pallas: Optional[bool]) -> bool:
    # Pallas SSIM measured 1.97x the XLA path on v5e (ops/ssim_pallas.py);
    # default it on for TPU eval, off elsewhere (CPU interpret mode is slow).
    if use_pallas is None:
        return jax.default_backend() == "tpu"
    return use_pallas


def compute_metrics(
    original: np.ndarray,
    predicted: np.ndarray,
    use_pallas: Optional[bool] = None,
) -> Dict[str, float]:
    """Volume metrics, V6 semantics.  original/predicted: (Z, H, W).

    Returns scalar stats PLUS the normalized volumes under 'orig_norm' /
    'pred_norm' — (Z, H, W) ndarrays, faithful to the reference's
    compute_metrics (`VolumeVisualization.py:237-269`) which returns them
    for the figure code.  Don't json.dump this dict directly; the
    JSON-safe per-spacing numbers come from per_sample_metrics /
    eval/runner.py.  Note the whole-volume 'psnr_mean' includes untouched
    slices (per-slice PSNR inf) exactly as V6 does — use
    predict_volume's 'metrics_predicted_only' for a finite number."""
    use_pallas = _auto_pallas(use_pallas)
    orig = np.asarray(original, np.float32)
    pred = np.asarray(predicted, np.float32)
    orig_min = orig.min()
    orig_range = orig.max() - orig_min + 1e-8
    orig_norm = (orig - orig_min) / orig_range
    pred_norm = np.clip((pred - orig_min) / orig_range, 0.0, 1.0)

    s = np.asarray(
        ssim_op(jnp.asarray(orig_norm), jnp.asarray(pred_norm),
                data_range=1.0, use_pallas=use_pallas)
    )
    p = np.asarray(
        psnr_op(jnp.asarray(orig_norm), jnp.asarray(pred_norm), data_range=1.0)
    )
    mae = float(np.mean(np.abs(orig_norm - pred_norm)))
    return {
        "ssim_mean": float(s.mean()),
        "ssim_std": float(s.std()),
        "psnr_mean": float(p.mean()),
        "psnr_std": float(p.std()),
        "mae": mae,
        "orig_norm": orig_norm,
        "pred_norm": pred_norm,
    }


def per_sample_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    mode: str = "minmax-each",
    use_pallas: Optional[bool] = None,
) -> Dict[str, float]:
    """Per-image metrics over a stack (N, H, W); returns mean/std/min/max."""
    use_pallas = _auto_pallas(use_pallas)
    gt = np.asarray(gt, np.float32)
    pred = np.asarray(pred, np.float32)
    if mode == "minmax-each":
        g = np.asarray(minmax_normalize(gt))
        p = np.asarray(minmax_normalize(pred))
    elif mode == "denorm-11":
        g = (gt + 1.0) / 2.0
        p = (pred + 1.0) / 2.0
    elif mode == "raw":
        g, p = gt, pred
    else:
        raise ValueError(mode)
    s = np.asarray(ssim_op(jnp.asarray(g), jnp.asarray(p), data_range=1.0,
                           use_pallas=use_pallas))
    q = np.asarray(psnr_op(jnp.asarray(g), jnp.asarray(p), data_range=1.0))
    return {
        "ssim_mean": float(s.mean()), "ssim_std": float(s.std()),
        "ssim_min": float(s.min()), "ssim_max": float(s.max()),
        "psnr_mean": float(q.mean()), "psnr_std": float(q.std()),
        "psnr_min": float(q.min()), "psnr_max": float(q.max()),
        "num_samples": int(len(s)),
    }


def spacing_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    distances: np.ndarray,
    mode: str = "minmax-each",
) -> Dict[str, Dict[str, float]]:
    """Metrics reported SEPARATELY per spacing, never aggregated — the
    README's metric contract (reference README.md:154-157).

    distances: (N,) of 2 (3 mm) / 4 (6 mm) per sample.
    """
    out: Dict[str, Dict[str, float]] = {}
    for dist, label in ((2, "3mm"), (4, "6mm")):
        mask = np.asarray(distances) == dist
        if mask.any():
            out[label] = per_sample_metrics(gt[mask], pred[mask], mode=mode)
    return out
