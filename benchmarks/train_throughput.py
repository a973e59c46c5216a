"""Training-throughput sweep for the device-resident scan-epoch runner.

The reference trained at ~13 slices/s on a B200 (diffusion) and an
unrecorded rate for the UNet family (SURVEY.md §6); the rebuild's
scan-epoch runner (train/device_epoch.py) was measured at ~320 slices/s at
batch 32 in round 1 without ever sweeping the batch size.  This benchmark
times WHOLE compiled epochs (one ``lax.scan`` per epoch — the only honest
timing unit on the axon TPU tunnel, see bench.py) for several batch sizes
and reports slices/s plus achieved TFLOP/s from XLA's cost analysis of the
compiled epoch program (scan bodies are counted ONCE regardless of trip
count, so ``flops / batch_size`` is the per-slice cost of one fused
train step: forward + backward + Adam).

Usage:
  python benchmarks/train_throughput.py --data /tmp/demo/store \
      [--batch-sizes 32,64,96,128] [--epochs-timed 2]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

V5E_BF16_PEAK_TFLOPS = 197.0


def _make_trainer(cfg, hw):
    if cfg.loss.kind == "gan":
        from mrisr_tpu.losses.perceptual import make_perceptual_fn
        from mrisr_tpu.train import GANTrainer

        return GANTrainer(
            cfg, perceptual_fn=make_perceptual_fn(cfg.loss.perceptual),
            image_size=hw,
        )
    if cfg.loss.kind == "diffusion":
        from mrisr_tpu.train import DiffusionTrainer

        return DiffusionTrainer(cfg, image_size=hw)
    from mrisr_tpu.train import SupervisedTrainer

    perceptual_fn = None
    if cfg.loss.kind == "combined":
        # real training pays the perceptual forward+backward — omitting it
        # here would over-report unet_combined throughput
        from mrisr_tpu.losses.perceptual import make_perceptual_fn

        perceptual_fn = make_perceptual_fn(cfg.loss.perceptual)
    return SupervisedTrainer(cfg, perceptual_fn=perceptual_fn, image_size=hw)


def bench_batch_size(store, batch_size: int, image_size: int,
                     epochs_timed: int, preset: str = "unet",
                     remat: bool = False) -> dict:
    import jax

    from mrisr_tpu.config import PRESETS
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.train.trainer import SupervisedTrainer

    base = PRESETS[preset]
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data, batch_size=batch_size,
            image_size=(image_size, image_size),
        ),
        model=dataclasses.replace(base.model, remat=remat),
        train=dataclasses.replace(base.train, compute_dtype="bfloat16"),
    )
    hw = cfg.data.image_size
    trainer = _make_trainer(cfg, hw)
    kind = "window" if cfg.model.name == "progressive_unet" else "triplet"
    loader = build_loader(store, "train", cfg.data, kind=kind,
                          backend="device")
    trainer.enable_device_epochs(loader.bank, loader.plan_flat)
    runner = trainer._device_runner

    key = jax.random.PRNGKey(0)
    flops_per_slice = None
    if isinstance(trainer, SupervisedTrainer):
        # scan bodies are counted once by cost analysis -> one fused step
        try:
            lowered = runner._epoch.lower(
                trainer.state, runner.flat, runner.plan, key
            )
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_slice = float(cost["flops"]) / batch_size / 1e9
        except Exception:
            pass

    m = trainer.run_epoch(None, train=True, epoch=0)  # compile + warm
    slices_per_epoch = runner.steps_per_epoch * batch_size

    t0 = time.perf_counter()
    for e in range(epochs_timed):
        m = trainer.run_epoch(None, train=True, epoch=e + 1)
    # run_epoch converts metrics to float -> already synced per epoch
    assert "loss" in m or m, m
    dt = (time.perf_counter() - t0) / epochs_timed

    slices_per_sec = slices_per_epoch / dt
    out = {
        "metric": f"{preset}_train_slices_per_sec_per_chip",
        "batch_size": batch_size,
        "steps_per_epoch": runner.steps_per_epoch,
        "value": round(slices_per_sec, 1),
        "unit": f"{image_size}x{image_size} slices/s",
    }
    if remat:
        out["remat"] = True
    if flops_per_slice is not None:
        achieved = slices_per_sec * flops_per_slice / 1e3
        out["train_gflops_per_slice"] = round(flops_per_slice, 1)
        out["achieved_tflops"] = round(achieved, 1)
        out["mfu"] = round(achieved / V5E_BF16_PEAK_TFLOPS, 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--batch-sizes", default="32,64,96,128")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--epochs-timed", type=int, default=2)
    p.add_argument("--preset", default="unet",
                   help="any training preset: unet / deepcnn / unet_gan / "
                        "progressive_unet / fastddpm / ...")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize double-conv blocks (UNet family): "
                        "~1/3 forward recompute for activation memory")
    args = p.parse_args()

    from mrisr_tpu.data.volumes import VolumeStore

    store = VolumeStore.open(args.data)
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        try:
            print(json.dumps(bench_batch_size(
                store, bs, args.image_size, args.epochs_timed,
                preset=args.preset, remat=args.remat)))
        except Exception as e:  # e.g. OOM at large batch: report, continue
            print(json.dumps({
                "metric": f"{args.preset}_train_slices_per_sec_per_chip",
                "batch_size": bs, "error": type(e).__name__,
                "detail": str(e)[:200],
            }))


if __name__ == "__main__":
    main()
