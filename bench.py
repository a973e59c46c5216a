"""Benchmark: UNet-combined inference throughput, 256² slices/sec/chip.

The reference publishes no throughput numbers (SURVEY.md §6); the rebuild's
north-star target is >= 5,000 256² slices/sec/chip on TPU v5e for the
UNet-combined model (BASELINE.json).  ``vs_baseline`` is throughput divided
by that 5k target.

Measurement notes (this matters on the axon TPU tunnel):
- identical dispatches can be served from a cache and ``block_until_ready``
  does not reliably synchronize, so the timed region is a SINGLE compiled
  ``lax.scan`` of K data-dependent forwards ended by a scalar fetch — no
  per-call dispatch latency, no cacheable repeats, a real device sync.
- batch sweep on v5e: 64 -> 1220, 128 -> 1569 (best), 192 -> 1476 slices/s,
  256 -> OOM; default is 128.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time


def bench_unet_inference(
    batch_size: int = 128,
    image_size: int = 256,
    scan_len: int = 10,
    repeats: int = 2,
) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.models import UNet

    # bf16 compute, fp32 params — metric-safe on this workload and 2x MXU rate
    model = UNet(features=64, dtype=jnp.bfloat16)
    x = jnp.zeros((batch_size, image_size, image_size, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def loop(variables, x):
        def body(carry, _):
            y = model.apply(variables, carry, train=False)  # (B, H, W, 1)
            # feed prediction back as both input channels: data dependency
            nxt = jnp.concatenate([y, carry[..., :1] * 0.5 + y * 0.5], axis=-1)
            return nxt, ()

        final, _ = jax.lax.scan(body, x, None, length=scan_len)
        return jnp.sum(final.astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    _ = float(loop(variables, x))  # compile + warm

    best = None
    for r in range(repeats):
        xr = x + r  # distinct input each repeat (defeat call caching)
        t0 = time.perf_counter()
        _ = float(loop(variables, xr))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    slices_per_sec = batch_size * scan_len / best
    return {
        "metric": "unet_combined_infer_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": f"{image_size}x{image_size} slices/s",
        "vs_baseline": round(slices_per_sec / 5000.0, 4),
    }


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--scan-len", type=int, default=10)
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args()
    result = bench_unet_inference(
        batch_size=args.batch_size, scan_len=args.scan_len,
        repeats=args.repeats,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
