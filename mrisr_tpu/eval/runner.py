"""Test-set evaluation runner: the README metric contract.

Computes SSIM/PSNR per spacing — 3 mm (distance-2 triplets) and 6 mm
(distance-4) SEPARATELY, never aggregated (reference README.md:154-157;
BASELINE.md targets).  Per-sample normalization follows the notebook eval
convention (min-max each image, `Fixed:cell21`) by default; 'volume' mode
runs the V6 original-range volume metrics instead.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import jax
import numpy as np

from mrisr_tpu.config import DataConfig
from mrisr_tpu.data.pipeline import build_loader
from mrisr_tpu.data.volumes import VolumeStore
from mrisr_tpu.eval.metrics import per_sample_metrics


def evaluate_pair_model_test_set(
    predict_fn,
    store: VolumeStore,
    data_cfg: DataConfig,
    split: str = "test",
    mode: str = "minmax-each",
    max_batches: Optional[int] = None,
    backend: str = "host",
) -> Dict[str, Dict[str, float]]:
    """predict_fn: (B, H, W, 2) -> (B, H, W, 1).  Returns {'3mm': ..., '6mm': ...}."""
    out: Dict[str, Dict[str, float]] = {}
    bank = None  # built once; the bank is distance-independent
    for dist, label in ((2, "3mm"), (4, "6mm")):
        import dataclasses

        cfg = dataclasses.replace(data_cfg, distance_filter=dist, augment=False)
        loader = build_loader(store, split, cfg, backend=backend, bank=bank)
        bank = loader.bank
        # queue device arrays; fetch ONCE at the end (per-batch np.asarray
        # forces a host sync each step — r1 verdict weak item 8)
        preds, gts = [], []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            pred = predict_fn(batch[..., :2])
            preds.append(pred[..., 0])
            gts.append(batch[..., 2])
        if not preds:
            continue
        preds = [np.asarray(p) for p in jax.device_get(preds)]
        gts = [np.asarray(g) for g in jax.device_get(gts)]
        # trim wrap-padding on the final batch
        n = loader.num_samples
        if max_batches is not None:
            n = min(n, max_batches * cfg.batch_size)
        pred_all = np.concatenate(preds)[:n]
        gt_all = np.concatenate(gts)[:n]
        out[label] = per_sample_metrics(gt_all, pred_all, mode=mode)
    return out


def evaluate_progressive_test_set(
    predict_fn,
    store: VolumeStore,
    data_cfg: DataConfig,
    split: str = "test",
    mode: str = "minmax-each",
    max_batches: Optional[int] = None,
    backend: str = "host",
) -> Dict[str, Dict[str, float]]:
    """Per-stage test metrics for the Progressive UNet: SSIM/PSNR for the
    i+1 / i+2 / i+3 outputs plus their average — the exact shape of
    ``results/progressive_unet_history.json: test_metrics``.

    predict_fn: (B, H, W, 5) -> (p1, p2, p3) each (B, H, W, 1).
    """
    import dataclasses

    cfg = dataclasses.replace(data_cfg, augment=False)
    loader = build_loader(store, split, cfg, kind="window", backend=backend)
    preds = {k: [] for k in ("i1", "i2", "i3")}
    gts = {k: [] for k in ("i1", "i2", "i3")}
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        p1, p2, p3 = predict_fn(batch)
        for k, p, gt_ch in (("i1", p1, 1), ("i2", p2, 2), ("i3", p3, 3)):
            preds[k].append(p[..., 0])
            gts[k].append(batch[..., gt_ch])
    preds = jax.device_get(preds)  # one bulk fetch, not one sync per batch
    gts = jax.device_get(gts)
    n = loader.num_samples
    if max_batches is not None:
        n = min(n, max_batches * cfg.batch_size)
    out: Dict[str, Dict[str, float]] = {}
    for k in ("i1", "i2", "i3"):
        out[k] = per_sample_metrics(
            np.concatenate(gts[k])[:n], np.concatenate(preds[k])[:n], mode=mode
        )
    out["average"] = {
        "ssim": float(np.mean([out[k]["ssim_mean"] for k in ("i1", "i2", "i3")])),
        "psnr": float(np.mean([out[k]["psnr_mean"] for k in ("i1", "i2", "i3")])),
    }
    return out


def evaluate_and_save(
    predict_fn,
    store: VolumeStore,
    data_cfg: DataConfig,
    out_json: Optional[str] = None,
    **kwargs,
) -> Dict:
    metrics = evaluate_pair_model_test_set(predict_fn, store, data_cfg, **kwargs)
    if out_json:
        import os

        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics
