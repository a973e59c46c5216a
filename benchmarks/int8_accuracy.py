"""Measure the accuracy cost of the int8 serving path (serve/quant.py).

Loads the demo UNet checkpoint, evaluates the bf16 (BN-folded) forward and
the int8 forward on the same test split, and reports per-spacing SSIM/PSNR
for both plus the deltas — the number BASELINE.md's roofline section points
at next to the 2,246 slices/s int8 speed.

Usage:
  python benchmarks/int8_accuracy.py --data /tmp/demo/store \
      --models /tmp/demo/models [--out results_demo/int8_accuracy.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

# Repo-root import without PYTHONPATH (PYTHONPATH breaks the axon plugin).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--models", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--model", default="unet",
                   help="checkpoint name (e.g. unet_distilled for a "
                        "student's serving-accuracy row)")
    p.add_argument("--features", type=int, default=None,
                   help="model width when it differs from the registry "
                        "default (distilled students)")
    p.add_argument("--variants", default=None,
                   help="comma list restricting which forward variants to "
                        "evaluate (default: all five).  Each full-test-set "
                        "pass costs ~15-20 min on the TPU tunnel, so "
                        "per-student Pareto rows use "
                        "'bf16,int8_fused_shared' — the deployed serving "
                        "config plus its same-path bf16 baseline — and "
                        "leave the absmax/percentile/dual diagnostics to "
                        "the teacher row")
    args = p.parse_args()

    _ALL_VARIANTS = ("bf16", "int8_absmax", "int8_p99.9",
                     "int8_fused_absmax", "int8_fused_shared")
    keep = None
    if args.variants:
        keep = {v.strip() for v in args.variants.split(",")}
        unknown = keep - set(_ALL_VARIANTS)
        if unknown:
            raise SystemExit(f"unknown variants: {sorted(unknown)}; "
                             f"choose from {sorted(_ALL_VARIANTS)}")
        if "bf16" not in keep:
            raise SystemExit("--variants must include bf16 (delta baseline)")

    import jax

    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import DataConfig
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.runner import evaluate_pair_model_test_set
    from mrisr_tpu.serve import (
        calibrate_unet,
        quantize_unet,
        unet_int8_apply,
        unet_int8_fused_apply,
    )

    store = VolumeStore.open(args.data)
    data_cfg = DataConfig(root=args.data, batch_size=32, augment=False)

    mcfg = None
    if args.features:
        from mrisr_tpu.config import ModelConfig

        mcfg = ModelConfig(name=args.model, base_features=args.features)
    loaded = load_model(
        args.model, models_dir=args.models, checkpoint="required",
        fold_bn=True, cfg=mcfg,
    )
    folded = loaded.variables

    # the baseline must BE the bf16 serving forward (bench.py runs
    # UNet(dtype=bfloat16) on bf16-resident params) — load_model's module
    # is fp32, which would silently shift every delta to "vs fp32"
    import jax.numpy as jnp

    from mrisr_tpu.models import UNet

    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        folded,
    )
    features = int(folded["params"]["enc1"]["Conv_0"]["kernel"].shape[-1])
    bf16_module = UNet(features=features, use_bn=False, dtype=jnp.bfloat16)
    bf16_fwd = jax.jit(
        lambda x: bf16_module.apply(bf16_vars, x, train=False).astype(
            jnp.float32)
    )

    # calibration: a few val batches (absmax per conv input)
    val_loader = build_loader(store, "val", data_cfg)
    calib_batches = []
    for i, batch in enumerate(val_loader):
        if i >= 4:
            break
        calib_batches.append(batch[..., :2])
    q_absmax = quantize_unet(folded, calibrate_unet(folded, calib_batches))
    q_p999 = quantize_unet(
        folded, calibrate_unet(folded, calib_batches, percentile=99.9)
    )

    variants = {
        "bf16": bf16_fwd,
        "int8_absmax": jax.jit(lambda x: unet_int8_apply(q_absmax, x)),
        "int8_p99.9": jax.jit(lambda x: unet_int8_apply(q_p999, x)),
        # skip_emit is pinned to 'dual' here: the serving default resolved
        # to 'shared' in r3, and without the pin this row would silently
        # duplicate int8_fused_shared instead of measuring the dual baseline
        "int8_fused_absmax": jax.jit(
            lambda x: unet_int8_fused_apply(q_absmax, x, skip_emit="dual")
        ),
        # single-emission shared-scale skips (serve/quant.py skip_emit):
        # coarser skip codes, measured here; the pallas upconv impl is
        # numerically equivalent to convt (tests/test_upconv_pallas.py)
        # so it needs no separate accuracy row
        "int8_fused_shared": jax.jit(
            lambda x: unet_int8_fused_apply(q_absmax, x, skip_emit="shared")
        ),
    }
    if args.variants:
        keep = {v.strip() for v in args.variants.split(",")}
        unknown = keep - set(variants)
        if unknown:
            raise SystemExit(f"unknown variants: {sorted(unknown)}; "
                             f"choose from {sorted(variants)}")
        if "bf16" not in keep:
            raise SystemExit("--variants must include bf16 (delta baseline)")
        variants = {k: v for k, v in variants.items() if k in keep}
    results = {}
    for label, fn in variants.items():
        results[label] = evaluate_pair_model_test_set(
            fn, store, data_cfg, max_batches=args.max_batches
        )
    deltas = {}
    for label in ("int8_absmax", "int8_p99.9", "int8_fused_absmax",
                  "int8_fused_shared"):
        if label not in results:
            continue
        deltas[label] = {}
        for sp in ("3mm", "6mm"):
            if sp in results["bf16"] and sp in results[label]:
                deltas[label][sp] = {
                    "ssim_delta": round(
                        results[label][sp]["ssim_mean"]
                        - results["bf16"][sp]["ssim_mean"], 6
                    ),
                    "psnr_delta_db": round(
                        results[label][sp]["psnr_mean"]
                        - results["bf16"][sp]["psnr_mean"], 4
                    ),
                }
    out = {"model": args.model, "features": features,
           **results, "delta_vs_bf16": deltas}
    print(json.dumps(out, indent=2))
    if args.out:
        pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
