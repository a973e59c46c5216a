"""InferenceEngine loopback throughput: a NUMBER for the engine overhead.

VERDICT r3 weak #6: the engine's double-buffered dispatch path
(serve/engine.py) claimed to "approach" bench.py's raw throughput with no
measurement attached.  This benchmark drives the real engine —
queue -> collect -> np.stack batch assembly -> async dispatch -> double
buffer -> future resolution — around the real int8_fused UNet forward, and
compares requests/sec against the raw single-program ceiling measured the
bench.py way in the same process.

Tunnel adaptation (CLAUDE.md): the axon host<->device link moves ~5.6 MB/s
and adds ~30 ms per round trip, neither representative of a real serving
host.  So the loopback apply fn ignores the assembled host batch's PAYLOAD
(the 67 MB upload would measure the network) and instead generates the
batch on device from a per-call key (distinct dispatches defeat the
tunnel's dispatch cache), returning a per-request (1, 1, 1) checksum so
the result fetch moves bytes, not images.  Everything else the engine does
per batch — 128 queue hops, the 67 MB np.stack memcpy, dispatch, the
blocking result sync, stats, future resolution — is the real code path.
The separately measured dispatch round-trip time is reported so the
engine/raw ratio can be read net of the tunnel artifact.

  python benchmarks/engine_loopback.py [--batch-size 128] [--requests 2560]
"""

from __future__ import annotations

import argparse
import itertools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def build_int8_fused_forward(batch_size: int, image_size: int,
                             features: int = 64):
    """The bench.py serving default: random-weight UNet, BN-folded,
    int8_fused (weights per-channel, activations calibrated absmax)."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
    from mrisr_tpu.models import UNet
    from mrisr_tpu.serve import (
        calibrate_unet,
        quantize_unet,
        unet_int8_fused_apply,
    )

    model = UNet(features=features, dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch_size, image_size, image_size, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    folded = fold_unet_batchnorm(variables["params"], variables["batch_stats"])
    calib_x = jax.random.normal(
        jax.random.PRNGKey(2), (8, image_size, image_size, 2), jnp.float32
    )
    qparams = quantize_unet(folded, calibrate_unet(folded, [calib_x]))
    return qparams, unet_int8_fused_apply


def measure_dispatch_rtt(repeats: int = 5) -> float:
    """One trivial compiled program + scalar fetch per call: the per-batch
    round-trip cost the tunnel adds that a local host would not."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(k):
        return jnp.sum(jax.random.normal(k, (8,), jnp.float32))

    _ = float(tiny(jax.random.PRNGKey(0)))  # compile
    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        _ = float(tiny(jax.random.PRNGKey(1 + r)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def bench_engine(batch_size: int, image_size: int, requests: int,
                 features: int = 64) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.serve.engine import InferenceEngine

    qparams, fwd = build_int8_fused_forward(batch_size, image_size, features)

    @jax.jit
    def device_batch_forward(key):
        xb = jax.random.normal(
            key, (batch_size, image_size, image_size, 2), jnp.float32
        )
        y = fwd(qparams, xb)  # (B, H, W, 1)
        # per-request checksum: the fetch stays bytes-sized on the tunnel
        return jnp.sum(
            y.astype(jnp.float32), axis=(1, 2, 3), keepdims=True
        )[..., None]

    base_key = jax.random.PRNGKey(7)
    calls = itertools.count()

    def loopback_apply(xs):
        # real engine contract: xs is the assembled (B, H, W, 2) host batch
        # (its np.stack memcpy already happened); the payload is replaced
        # by an on-device batch keyed per call (see module docstring)
        assert xs.shape[0] == batch_size
        return device_batch_forward(jax.random.fold_in(base_key, next(calls)))

    req = np.zeros((image_size, image_size, 2), np.float32)
    with InferenceEngine(
        loopback_apply, batch_size=batch_size,
        input_shape=(image_size, image_size, 2), max_delay_ms=2.0,
    ) as eng:
        # warm: one full batch through the engine (compiles the forward),
        # then zero the counters so compile time stays out of the
        # steady-state stats
        _ = eng.predict_many([req] * batch_size)
        eng.reset_stats()
        t0 = time.perf_counter()
        futures = [eng.submit(req) for _ in range(requests)]
        for f in futures:
            f.result()
        wall = time.perf_counter() - t0
        stats = eng.stats

    per_batch = max(stats.batches, 1)
    return {
        "engine_slices_per_sec": round(requests / wall, 2),
        "engine_internal_slices_per_sec": round(stats.slices_per_sec, 2),
        "occupancy": round(stats.occupancy, 4),
        "batches": stats.batches,
        "assemble_ms_per_batch": round(
            stats.assemble_time_s / per_batch * 1e3, 2),
        "fetch_ms_per_batch": round(stats.fetch_time_s / per_batch * 1e3, 2),
        "wall_s": round(wall, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--requests", type=int, default=2560)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--skip-raw", action="store_true",
                   help="skip the raw bench.py ceiling (reuse a recorded "
                        "number offline)")
    args = p.parse_args()

    rtt = measure_dispatch_rtt()
    out = {
        "metric": "engine_loopback_slices_per_sec",
        "batch_size": args.batch_size,
        "dispatch_rtt_ms": round(rtt * 1e3, 1),
    }
    out.update(bench_engine(args.batch_size, args.image_size, args.requests,
                            args.features))
    if not args.skip_raw:
        import bench

        raw = bench.bench_unet_inference(
            batch_size=args.batch_size, image_size=args.image_size,
            quant="int8_fused", features=args.features,
        )
        out["raw_slices_per_sec"] = raw["value"]
        out["engine_efficiency"] = round(
            out["engine_slices_per_sec"] / raw["value"], 4
        )
        # the tunnel charges ~rtt per engine batch that a local host would
        # not; the corrected ceiling folds that artifact into the raw rate
        batch_s = args.batch_size / raw["value"]
        corrected = args.batch_size / (batch_s + rtt)
        out["tunnel_corrected_ceiling"] = round(corrected, 2)
        out["engine_efficiency_vs_corrected"] = round(
            out["engine_slices_per_sec"] / corrected, 4
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
