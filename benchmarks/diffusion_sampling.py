"""Fast-DDPM T=10 sampling throughput sweep.

The reference sampled in a per-step Python loop with `empty_cache()` every
batch (`notebooks/FastDDPM_Training_Fixed.ipynb:cell13`); the rebuild's
sampler is ONE jitted `lax.scan` of 10 conditioned UNet forwards
(models/diffusion.py:sample_ancestral).  Round-1 recorded ~60 slices/s at
batch 16 without sweeping; this measures batch scaling.

Timing on the axon tunnel follows bench.py rules: the sampler is a single
compiled program; inputs are generated ON DEVICE (the tunnel's host->device
path is ~5.6 MB/s — uploading a real batch would measure the network);
the host fetch of a scalar is the sync.

Per-slice FLOPs: XLA cost analysis counts a scan body ONCE, so the
reported ``gflops_per_slice`` is cost_flops/batch x num_steps — the
10 sequential forwards a sample actually costs (+ the epsilon/posterior
arithmetic, which rides in the same body).

  python benchmarks/diffusion_sampling.py [--batch-sizes 16,64,128]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

V5E_BF16_PEAK_TFLOPS = 197.0


def bench_sampling(batch_size: int, image_size: int = 256,
                   repeats: int = 2, quant: str = "none",
                   gn_impl: str | None = None,
                   num_steps: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.config import PRESETS
    from mrisr_tpu.models.diffusion import (
        DiffusionSchedule,
        FastDDPMUNet,
        sample_ancestral,
    )

    mcfg = PRESETS["fastddpm"].model
    model = FastDDPMUNet(
        base_features=mcfg.base_features, time_dim=mcfg.time_dim,
        dtype=jnp.bfloat16,
    )
    hw = image_size
    x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    schedule = DiffusionSchedule.create(
        num_timesteps=mcfg.num_timesteps,
        num_inference_steps=mcfg.num_inference_steps,
        beta_schedule=mcfg.beta_schedule,
        selection=mcfg.timestep_selection,
    )

    if quant in ("int8", "int8_deep"):
        # int8 convs on the MXU (serve/quant_diffusion.py); calibration
        # ranges don't affect throughput, so one small random-cond
        # trajectory suffices for a speed measurement (accuracy is the
        # separate benchmarks/diffusion_int8_accuracy.py).  'int8_deep'
        # quantizes only the <=128² sites (DEEP_SITES) — the 256² level
        # measured int8-NEGATIVE (see docs/SERVING.md diffusion section).
        from mrisr_tpu.serve.quant_diffusion import (
            DEEP_SITES,
            calibrate_fastddpm,
            fastddpm_int8_apply,
            quantize_fastddpm,
        )

        calib_cond = jax.random.normal(
            jax.random.PRNGKey(3), (8, hw, hw, 2), jnp.float32
        )
        qtree = quantize_fastddpm(
            variables,
            calibrate_fastddpm(
                variables, schedule, [calib_cond], jax.random.PRNGKey(4),
                time_dim=mcfg.time_dim,
            ),
            only=DEEP_SITES if quant == "int8_deep" else None,
        )

        def eps_fn(x_in, t):
            # gn_impl: 'pallas' fuses GN+SiLU+quantize into one VMEM pass
            # at the deep sites (ops/groupnorm_pallas.py); None = the
            # measured backend default
            return fastddpm_int8_apply(
                qtree, x_in, t, time_dim=mcfg.time_dim, gn_impl=gn_impl
            )
    else:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )

        def eps_fn(x_in, t):
            return model.apply(variables, x_in, t)

    if num_steps is not None:
        # the step-distilled serving path (serve/distill_diffusion.py):
        # deterministic DDIM over a shrunk grid.  Throughput depends only
        # on the scan length, so any size-num_steps subset measures the
        # distilled student's serving cost; the top noise level is kept,
        # matching grid_positions().  --num-steps >= the full grid clamps
        # to the full grid but STAYS on the DDIM-grid sampler — silently
        # switching to the ancestral chain would measure a different
        # program than the flag requested.
        import numpy as np

        from mrisr_tpu.serve.distill_diffusion import (
            sample_ddim_grid,
            subgrid_schedule,
        )

        n_full = schedule.num_inference_steps
        num_steps = min(num_steps, n_full)
        pos = np.linspace(0, n_full - 1, num_steps).round().astype(int)
        pos[-1] = n_full - 1
        schedule = subgrid_schedule(schedule, pos)

        @jax.jit
        def run(key):
            cond = jax.random.normal(
                key, (batch_size, hw, hw, 2), jnp.float32
            )
            out = sample_ddim_grid(eps_fn, cond, key, schedule)
            return jnp.sum(out.astype(jnp.float32))

    else:

        @jax.jit
        def run(key):
            # cond generated on device (see module docstring)
            cond = jax.random.normal(
                key, (batch_size, hw, hw, 2), jnp.float32
            )
            out = sample_ancestral(
                eps_fn, cond, key, schedule, num_samples=1, combine="first"
            )
            return jnp.sum(out.astype(jnp.float32))

    compiled = run.lower(jax.random.PRNGKey(1)).compile()
    gflops_per_slice = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops_per_slice = (
            float(cost["flops"]) / batch_size / 1e9
            * schedule.num_inference_steps
        )
    except Exception:
        pass
    _ = float(run(jax.random.PRNGKey(1)))  # warm

    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        _ = float(run(jax.random.PRNGKey(2 + r)))  # distinct dispatches
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    slices_per_sec = batch_size / best
    out = {
        "metric": (
            f"fastddpm_t{schedule.num_inference_steps}"
            "_sampling_slices_per_sec"
        ),
        "batch_size": batch_size,
        "value": round(slices_per_sec, 2),
        "unit": f"{image_size}x{image_size} slices/s",
    }
    if quant != "none":
        out["quant"] = quant
        if gn_impl is not None:
            out["gn_impl"] = gn_impl
    if gflops_per_slice is not None:
        achieved = slices_per_sec * gflops_per_slice / 1e3
        out["gflops_per_slice"] = round(gflops_per_slice, 1)
        out["achieved_tflops"] = round(achieved, 1)
        out["mfu"] = round(achieved / V5E_BF16_PEAK_TFLOPS, 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", default="16,64,128")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--quant", default="none",
                   choices=("none", "int8", "int8_deep"))
    p.add_argument("--gn-impl", default=None, choices=("xla", "pallas"),
                   help="int8 paths only: GroupNorm lowering (default: the "
                        "measured backend default, serve/quant_diffusion.py)")
    p.add_argument("--num-steps", type=int, default=None,
                   help="bench a step-distilled student's DDIM grid of this "
                        "length instead of the full T=10 ancestral chain")
    args = p.parse_args()
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        try:
            print(json.dumps(
                bench_sampling(bs, args.image_size, quant=args.quant,
                               gn_impl=args.gn_impl,
                               num_steps=args.num_steps)
            ))
        except Exception as e:
            print(json.dumps({
                "metric": "fastddpm_t10_sampling_slices_per_sec",
                "batch_size": bs, "error": type(e).__name__,
                "detail": str(e)[:200],
            }))


if __name__ == "__main__":
    main()
