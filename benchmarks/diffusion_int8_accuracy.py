"""Measure the accuracy cost of int8 Fast-DDPM sampling
(serve/quant_diffusion.py).

Loads the demo fastddpm checkpoint, samples the full test split with the
bf16 sampler and the int8-conv sampler under the SAME noise keys, and
reports per-spacing SSIM/PSNR for both plus deltas — the number that rides
next to the int8 sampling speed (benchmarks/diffusion_sampling.py --quant
int8).  Quantization noise feeds back through the 10-step chain, so only
this end-to-end delta — not per-call eps error — is the serving contract.

Usage:
  python benchmarks/diffusion_int8_accuracy.py --data /tmp/demo/store \
      --models /tmp/demo/models [--out results_demo/diffusion_int8_accuracy.json]
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
    p.add_argument("--model", default="fastddpm",
                   help="'fastddpm' or a step-distilled 'fastddpm_steps<N>' "
                        "(measured under ITS DDIM-grid sampler + trajectory "
                        "calibration)")
    p.add_argument("--out", default=None)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import DataConfig, PRESETS
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.runner import evaluate_pair_model_test_set
    from mrisr_tpu.models.diffusion import sample_ancestral
    from mrisr_tpu.serve.distill_diffusion import sample_ddim_grid
    from mrisr_tpu.serve.quant_diffusion import (
        DEEP_SITES,
        calibrate_fastddpm,
        fastddpm_int8_apply,
        quantize_fastddpm,
    )

    store = VolumeStore.open(args.data)
    data_cfg = DataConfig(
        root=args.data, batch_size=args.batch_size, augment=False
    )
    time_dim = PRESETS["fastddpm"].model.time_dim

    loaded = load_model(
        args.model, models_dir=args.models, checkpoint="required"
    )
    variables, schedule = loaded.variables, loaded.schedule
    sampler_kind = loaded.sampler or "ancestral"

    # calibrate activation ranges over the real sampling trajectory on a
    # few val conditioning batches (the model's OWN sampler's trajectory)
    val_loader = build_loader(store, "val", data_cfg)
    calib = []
    for i, batch in enumerate(val_loader):
        if i >= 2:
            break
        calib.append(batch[..., :2])
    ranges = calibrate_fastddpm(
        variables, schedule, calib, jax.random.PRNGKey(0), time_dim=time_dim,
        sampler=sampler_kind,
    )
    qtree = quantize_fastddpm(variables, ranges)
    qtree_deep = quantize_fastddpm(variables, ranges, only=DEEP_SITES)

    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    model = loaded.module

    def sampler(eps_fn):
        # fixed key per call == the cli-eval convention (api.py
        # LoadedModel.predict_nhwc); identical keys for both variants so
        # the delta isolates quantization, not noise draws
        if sampler_kind == "ddim_grid":
            return jax.jit(
                lambda cond: sample_ddim_grid(
                    eps_fn, cond, jax.random.PRNGKey(0), schedule
                )
            )
        return jax.jit(
            lambda cond: sample_ancestral(
                eps_fn, cond, jax.random.PRNGKey(0), schedule
            )
        )

    variants = {
        "bf16": sampler(lambda xi, ti: model.apply(bf16_vars, xi, ti)),
        "int8": sampler(
            lambda xi, ti: fastddpm_int8_apply(
                qtree, xi, ti, time_dim=time_dim
            )
        ),
        # the serving recommendation: only the <=128² sites int8 — the only
        # variant measured FASTER than bf16 (benchmarks/diffusion_sampling.py
        # --quant int8_deep; docs/SERVING.md diffusion section)
        "int8_deep": sampler(
            lambda xi, ti: fastddpm_int8_apply(
                qtree_deep, xi, ti, time_dim=time_dim
            )
        ),
    }
    results = {}
    for label, fn in variants.items():
        results[label] = evaluate_pair_model_test_set(
            fn, store, data_cfg, max_batches=args.max_batches
        )
    deltas = {}
    for label in ("int8", "int8_deep"):
        for sp in ("3mm", "6mm"):
            if sp in results["bf16"] and sp in results[label]:
                deltas.setdefault(label, {})[sp] = {
                    "ssim_delta": round(
                        results[label][sp]["ssim_mean"]
                        - results["bf16"][sp]["ssim_mean"], 6
                    ),
                    "psnr_delta_db": round(
                        results[label][sp]["psnr_mean"]
                        - results["bf16"][sp]["psnr_mean"], 4
                    ),
                }
    out = {**results, "delta_vs_bf16": deltas}
    print(json.dumps(out, indent=2))
    if args.out:
        pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
