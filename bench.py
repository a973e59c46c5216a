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
- scan_len amortizes the ONE remaining dispatch round-trip (~30 ms on the
  tunnel).  Measured int8_fused ladder at batch 128: scan_len 10 -> 2,829
  slices/s, 30 -> 2,968, 50 -> 2,989, 100 -> 3,011 — converging to the
  per-op device profile's 42.2 ms/iter steady state (= 3,031 slices/s,
  docs/SERVING.md), i.e. long scans measure the device, not the harness.
  Default is 100 (r3; earlier rounds' JSONs used 10 — add ~6% when
  comparing).
- batch sweep on v5e: 64 -> 1220, 128 -> 1569 (best), 192 -> 1476 slices/s,
  256 -> OOM; default is 128.

Roofline context (see BASELINE.md "Roofline"): the exact M2 topology costs
~94 GFLOP per 256² slice (measured below from XLA cost analysis of the
compiled program, not hand-counted).  TPU v5e bf16 dense peak is
~197 TFLOP/s, so the single-chip bf16 ceiling for THIS model is
197e12 / 94e9 ≈ 2,100 slices/s at 100% MFU.  The 5,000 slices/s
north-star therefore cannot be met by the exact topology in bf16 on one
chip; the bench reports ``mfu`` so the number can be judged against the
hardware, not just the (mis-set) target.

Default serving configuration is the int8 MXU path with int8-resident
activations (``--quant int8_fused``, serve/quant.py) — the fastest
exact-topology configuration, measured within +0.005 SSIM of bf16 on the
demo checkpoint (results_demo/int8_accuracy.json).  Measured v5e ladder
at batch 128: bf16 1,627 (77.8% MFU) -> int8 2,246 -> int8_fused with the
r3 full-int8 decoder + shared-scale skips 2,829 at scan_len 10 / **3,011
at the scan_len-100 default** (1.44x the bf16 dense peak; the difference
is the amortized dispatch, see measurement notes).  ``--quant none``
reproduces the bf16 number.  The width-32
distilled student (serve/distill.py, ``--features 32``) measures 8,384
slices/s with int8_fused at batch 384 — 1.68x the 5k target — at a
measured -0.007 SSIM vs its teacher (BASELINE.md, results_demo/README.md);
it is NOT the default because it changes the weights.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "gflops_per_slice",
 "achieved_tflops", "mfu"}.
"""

from __future__ import annotations

import json
import time

from mrisr_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

# TPU v5e dense bf16 peak (public spec: 394 TOPS int8, 197 TFLOP/s bf16).
V5E_BF16_PEAK_TFLOPS = 197.0


def _compiled_gflops(lowered_compiled, batch_size: int) -> float | None:
    """Per-slice GFLOPs from XLA's cost analysis of the compiled program.

    XLA's cost analysis counts a ``lax.scan``/while-loop body ONCE regardless
    of trip count (verified: total flops identical for scan_len 1/2/4), so
    the divisor is the batch size only, not batch*scan_len.  Measured here:
    94.47 GFLOP per 256² slice for the exact M2 topology — matching the
    hand count (2×MAC convention, same as the 197 TFLOP/s peak spec).
    """
    try:
        cost = lowered_compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost["flops"])
        return flops / batch_size / 1e9
    except Exception:
        return None


def bench_unet_inference(
    batch_size: int = 128,
    image_size: int = 256,
    scan_len: int = 100,
    repeats: int = 2,
    quant: str = "none",
    features: int = 64,
    upconv_impl: str | None = None,
    skip_emit: str | None = None,
) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.models import UNet

    # bf16 compute AND bf16-resident params: halves weight HBM traffic per
    # forward vs fp32 params cast per call (VERDICT r1 item 2).  Metric-safe
    # on this workload (see tests/test_models.py bf16-vs-fp32 tolerance).
    # features=64 is the exact M2 topology; 32 benches the unet_distilled
    # serving student (serve/distill.py — accuracy measured separately).
    model = UNet(features=features, dtype=jnp.bfloat16)
    x = jnp.zeros((batch_size, image_size, image_size, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    if quant in ("int8", "int8_fused"):
        # opt-in int8 MXU serving path (serve/quant.py): BN-folded weights
        # quantized per-channel, activations per-layer; accuracy cost is
        # measured separately (results_demo/README.md).  int8_fused keeps
        # activations int8-resident in HBM (requant in the conv epilogue).
        from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
        from mrisr_tpu.serve import (
            calibrate_unet, quantize_unet, unet_int8_apply,
            unet_int8_fused_apply,
        )

        folded = fold_unet_batchnorm(
            variables["params"], variables["batch_stats"]
        )
        calib_x = jax.random.normal(
            jax.random.PRNGKey(2), (8, image_size, image_size, 2), jnp.float32
        )
        qparams = quantize_unet(folded, calibrate_unet(folded, [calib_x]))
        variables = qparams
        if quant == "int8_fused":
            # upconv_impl / skip_emit select measured lowering variants of
            # the fused path (serve/quant.py docstrings carry the numbers)
            apply_fn = lambda v, b: unet_int8_fused_apply(  # noqa: E731
                v, b, upconv_impl=upconv_impl, skip_emit=skip_emit
            )
        else:
            apply_fn = lambda v, b: unet_int8_apply(v, b)  # noqa: E731
    else:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
        apply_fn = lambda v, b: model.apply(v, b, train=False)  # noqa: E731

    @jax.jit
    def loop(variables, x):
        def body(carry, _):
            y = apply_fn(variables, carry)  # (B, H, W, 1)
            # feed prediction back as both input channels: data dependency
            nxt = jnp.concatenate([y, carry[..., :1] * 0.5 + y * 0.5], axis=-1)
            return nxt, ()

        final, _ = jax.lax.scan(body, x, None, length=scan_len)
        return jnp.sum(final.astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    compiled = loop.lower(variables, x).compile()
    gflops_per_slice = _compiled_gflops(compiled, batch_size)
    _ = float(loop(variables, x))  # warm (also populates the jit cache)

    best = None
    for r in range(repeats):
        xr = x + r  # distinct input each repeat (defeat call caching)
        t0 = time.perf_counter()
        _ = float(loop(variables, xr))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    slices_per_sec = batch_size * scan_len / best
    result = {
        "metric": "unet_combined_infer_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": f"{image_size}x{image_size} slices/s",
        "vs_baseline": round(slices_per_sec / 5000.0, 4),
    }
    if quant != "none":
        result["quant"] = quant
    if features != 64:
        result["features"] = features
    if quant == "int8_fused":
        # record the RESOLVED variants so every JSON line is reproducible —
        # from the same resolution the apply fn performs (quant.py), so a
        # legacy table's silent shared->dual degrade is reported as run
        from mrisr_tpu.serve.quant import resolve_variants

        result["upconv_impl"], result["skip_emit"] = resolve_variants(
            variables, upconv_impl, skip_emit
        )
    if gflops_per_slice is not None:
        # int8 programs report conv flops on the same 2xMAC convention, so
        # MFU stays against the bf16 peak: >1.0 means the int8 path passed
        # the bf16 roofline
        achieved_tflops = slices_per_sec * gflops_per_slice / 1e3
        result["gflops_per_slice"] = round(gflops_per_slice, 1)
        result["achieved_tflops"] = round(achieved_tflops, 1)
        result["mfu"] = round(achieved_tflops / V5E_BF16_PEAK_TFLOPS, 3)
    return result


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--scan-len", type=int, default=100)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument(
        "--quant", default="int8_fused",
        choices=("none", "int8", "int8_fused"),
    )
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--upconv-impl", default=None,
                   choices=("convt", "einsum", "pallas"),
                   help="default: the measured best (serve/quant.py "
                        "_default_variants)")
    p.add_argument("--skip-emit", default=None, choices=("dual", "shared"),
                   help="default: the measured best")
    args = p.parse_args()
    result = bench_unet_inference(
        batch_size=args.batch_size, scan_len=args.scan_len,
        repeats=args.repeats, quant=args.quant, features=args.features,
        upconv_impl=args.upconv_impl, skip_emit=args.skip_emit,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
