"""Sweep the int8_fused lowering variants on the real TPU (VERDICT r2 #4).

Measures the full serving program (bench.py's scan harness) for each
(upconv_impl, skip_emit) combination:

- upconv_impl: 'convt' (XLA conv_transpose — 4x dilation-waste MACs),
  'pallas' (ops/upconv_pallas.py — dense matmul + in-VMEM phase shuffle +
  fused decoder concat);
- skip_emit: 'dual' (two int8 emissions per encoder output) vs 'shared'
  (one emission at a shared scale, ratio folded into consumer dequants).

One JSON line per cell.  Usage:
    python benchmarks/int8_variants.py [--batch-size 128] [--features 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import bench_unet_inference  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--scan-len", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    for upconv_impl in ("convt", "pallas"):
        for skip_emit in ("dual", "shared"):
            try:
                r = bench_unet_inference(
                    batch_size=args.batch_size, scan_len=args.scan_len,
                    repeats=args.repeats, quant="int8_fused",
                    features=args.features,
                    upconv_impl=upconv_impl, skip_emit=skip_emit,
                )
                # bench_unet_inference records the RESOLVED variants itself
            except Exception as e:  # noqa: BLE001 — report the cell, keep sweeping
                r = {
                    "upconv_impl": upconv_impl, "skip_emit": skip_emit,
                    "error": type(e).__name__, "detail": str(e)[:300],
                }
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
