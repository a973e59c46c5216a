"""Sustained serving throughput through the FULL engine stack.

bench.py measures the raw compiled forward (one lax.scan, no host in the
loop) — the roofline number.  This benchmark measures what a client
actually sees through serve/engine.py: request queue, batch assembly,
double-buffered dispatch, host fetch, future resolution.  The gap between
the two is the runtime overhead the engine's micro-batching + pipelining
is supposed to hide.

Run on the TPU (fresh weights are fine for throughput):
  python benchmarks/engine_throughput.py [--quant int8_fused]
      [--batch-size 128] [--requests 2048]

MEASURED ON THE AXON TUNNEL (2026-08, int8_fused, batch 128, 2048 req):
10.5 slices/s at occupancy 1.0 — i.e. ~12 s per batch whose device compute
is ~48 ms.  The tunnel's host->device path moves the 67 MB input batch at
~5.6 MB/s, so on THIS machine the engine is network-bound and the number
says nothing about the engine or the chip (bench.py, which generates data
on-device, is the hardware truth: 2,644 slices/s).  On a real TPU host
(PCIe/DMA, GB/s-class H2D) the 67 MB batch moves in tens of ms and
double buffering hides it; use this harness there.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quant", default="int8_fused",
                   choices=("none", "int8", "int8_fused"))
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--requests", type=int, default=2048)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--features", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
    from mrisr_tpu.models import UNet
    from mrisr_tpu.serve.engine import InferenceEngine

    hw = args.image_size
    model = UNet(features=args.features, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 2)), train=False
    )
    if args.quant == "none":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
        apply_fn = jax.jit(
            lambda x: model.apply(variables, x, train=False).astype(
                jnp.float32)
        )
    else:
        from mrisr_tpu.serve.quant import (
            calibrate_unet,
            quantize_unet,
            unet_int8_apply,
            unet_int8_fused_apply,
        )

        folded = fold_unet_batchnorm(
            variables["params"], variables["batch_stats"]
        )
        calib = jax.random.normal(
            jax.random.PRNGKey(2), (8, hw, hw, 2), jnp.float32
        )
        q = quantize_unet(folded, calibrate_unet(folded, [calib]))
        fwd = (unet_int8_fused_apply if args.quant == "int8_fused"
               else unet_int8_apply)
        apply_fn = jax.jit(lambda x: fwd(q, x))

    # warm/compile outside the timed region
    _ = np.asarray(apply_fn(np.zeros((args.batch_size, hw, hw, 2),
                                     np.float32)))

    eng = InferenceEngine(
        apply_fn, batch_size=args.batch_size, input_shape=(hw, hw, 2),
        max_delay_ms=2.0,
    )
    rng = np.random.RandomState(0)
    # small input pool, perturbed per request: with an UNperturbed pool
    # whose size divides the batch size, every assembled batch would be
    # byte-identical and the tunnel's dispatch cache could serve repeats
    pool = [rng.rand(hw, hw, 2).astype(np.float32) for _ in range(16)]

    t0 = time.perf_counter()
    futures = [
        eng.submit(pool[i % len(pool)] + np.float32(i) * np.float32(1e-6))
        for i in range(args.requests)
    ]
    for f in futures:
        f.result(timeout=600)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "engine_sustained_slices_per_sec",
        "value": round(args.requests / dt, 2),
        "unit": f"{hw}x{hw} slices/s",
        "quant": args.quant,
        "batch_size": args.batch_size,
        "requests": args.requests,
        "batches": eng.stats.batches,
        "occupancy": round(eng.stats.occupancy, 4),
    }))
    eng.close()


if __name__ == "__main__":
    main()
