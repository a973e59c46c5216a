"""Measure ssim_pallas vs the XLA conv SSIM on the TPU (r1 verdict item 6).

Axon-tunnel measurement rules (CLAUDE.md / bench.py): the timed region is a
single compiled lax.scan whose iterations are data-dependent (x is nudged by
the previous mean SSIM so no dispatch can be served from cache), ended by a
scalar fetch.  Both paths run the same batch and scan length.

Usage: python benchmarks/ssim_pallas_bench.py [--batch 64] [--scan 20]
Prints one JSON line per path plus the speedup.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

# Repo-root import without PYTHONPATH: setting PYTHONPATH breaks the axon
# TPU plugin's helper process on this machine (backend fails to register).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def bench(fn_name: str, ssim_fn, batch: int, scan_len: int, repeats: int = 3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, y):
        def body(carry, _):
            x = carry
            s = ssim_fn(x, y)                      # (B,) mean SSIM per image
            # data dependency: nudge x by the mean (keeps values in range)
            x = x + 1e-6 * jnp.mean(s)
            return x, ()

        x, _ = jax.lax.scan(body, x, None, length=scan_len)
        return jnp.sum(x)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, 256, 256), jnp.float32)
    y = jnp.clip(x + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), x.shape), 0, 1)
    _ = float(loop(x, y))  # compile + warm
    best = None
    for r in range(repeats):
        xr = x * (1.0 + 1e-5 * (r + 1))
        t0 = time.perf_counter()
        _ = float(loop(xr, y))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    images_per_sec = batch * scan_len / best
    out = {"path": fn_name, "images_per_sec_256": round(images_per_sec, 1),
           "best_s": round(best, 4)}
    print(json.dumps(out))
    return images_per_sec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--scan", type=int, default=20)
    args = p.parse_args()

    from mrisr_tpu.ops.ssim import ssim as ssim_xla
    from mrisr_tpu.ops.ssim_pallas import ssim_pallas

    xla_rate = bench("xla", ssim_xla, args.batch, args.scan)
    pallas_rate = bench("pallas", ssim_pallas, args.batch, args.scan)
    print(json.dumps({"speedup_pallas_over_xla":
                      round(pallas_rate / xla_rate, 3)}))


if __name__ == "__main__":
    main()
