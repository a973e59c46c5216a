"""Per-op TPU profile of the int8_fused serving program (VERDICT r2 #4).

Produces the evidence for where the exact-topology int8 path's time goes:
traces one compiled 10-iteration inference loop with ``jax.profiler``
(device-side XLA op events DO come back through the axon tunnel), maps each
fused op back to its convolution's shapes via the compiled HLO text, and
prints a table of measured time vs the int8 roofline ideal per conv.

Measured finding (v5e, batch 128, full-int8 decoder — r3): the program is
MXU-UTILIZATION-bound, not bandwidth-bound.  The convs whose output-channel
dim is 64 (enc1, dec1, upconv1 — the full-resolution 256² level) can fill
at most half of the MXU's 128 output lanes, and measure ~35-50 % of the
int8 peak; the 128-1024-channel convs of the deeper levels run at ~85-100 %.
Weighting each conv's FLOPs by its channel-limited ceiling puts the
whole-program ceiling at ~3.3-3.6k slices/s — the measured 2.65-2.9k is
~80 % of that structural ceiling, and the remaining gap is XLA's conv
schedule, not anything this code controls short of hand-written Pallas
convs.  The 64-channel limit is a property of the reference M2 topology
(`/root/reference/src/ModelLoader.py:66-145`), which serving must preserve.

Usage:  python benchmarks/int8_profile.py [--batch-size 128] [--features 64]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import pathlib
import re
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

V5E_INT8_PEAK_TOPS = 394.0  # 2x the 197 TFLOP/s bf16 dense peak


def build_loop(batch_size: int, image_size: int, features: int):
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
    x = jnp.zeros((batch_size, image_size, image_size, 2), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_unet_batchnorm(v["params"], v["batch_stats"])
    calib_x = jax.random.normal(
        jax.random.PRNGKey(2), (8, image_size, image_size, 2), jnp.float32
    )
    q = quantize_unet(folded, calibrate_unet(folded, [calib_x]))

    @jax.jit
    def loop(q, x):
        def body(c, _):
            y = unet_int8_fused_apply(q, c)
            nxt = jnp.concatenate([y, c[..., :1] * 0.5 + y * 0.5], axis=-1)
            return nxt, ()

        f, _ = jax.lax.scan(body, x, None, length=10)
        return jnp.sum(f.astype(jnp.float32))

    xr = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    return loop, q, xr


def build_diffusion_loop(batch_size: int, image_size: int,
                         quant: str = "int8_deep"):
    """The T=10 int8 ancestral sampler as one profileable program — the
    sampler's own lax.scan is the loop (one iteration == one UNet
    forward), so the same while-op bookkeeping applies."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.config import PRESETS
    from mrisr_tpu.models.diffusion import (
        DiffusionSchedule,
        FastDDPMUNet,
        sample_ancestral,
    )
    from mrisr_tpu.serve.quant_diffusion import (
        DEEP_SITES,
        calibrate_fastddpm,
        fastddpm_int8_apply,
        quantize_fastddpm,
    )

    mcfg = PRESETS["fastddpm"].model
    model = FastDDPMUNet(
        base_features=mcfg.base_features, time_dim=mcfg.time_dim,
        dtype=jnp.bfloat16,
    )
    hw = image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    schedule = DiffusionSchedule.create(
        num_timesteps=mcfg.num_timesteps,
        num_inference_steps=mcfg.num_inference_steps,
        beta_schedule=mcfg.beta_schedule,
        selection=mcfg.timestep_selection,
    )
    calib_cond = jax.random.normal(
        jax.random.PRNGKey(3), (8, hw, hw, 2), jnp.float32
    )
    q = quantize_fastddpm(
        variables,
        calibrate_fastddpm(
            variables, schedule, [calib_cond], jax.random.PRNGKey(4),
            time_dim=mcfg.time_dim,
        ),
        only=DEEP_SITES if quant == "int8_deep" else None,
    )

    @jax.jit
    def loop(q, cond):
        out = sample_ancestral(
            lambda xi, ti: fastddpm_int8_apply(
                q, xi, ti, time_dim=mcfg.time_dim
            ),
            cond, jax.random.PRNGKey(5), schedule,
        )
        return jnp.sum(out.astype(jnp.float32))

    cond = jax.random.normal(
        jax.random.PRNGKey(1), (batch_size, hw, hw, 2), jnp.float32
    )
    return loop, q, cond


def _parse_computations(hlo: str):
    """HLO computation name -> body text."""
    comps = {}
    cur, buf = None, []
    for line in hlo.splitlines():
        if re.match(r"^(ENTRY )?%([\w.\-]+)\.?\s*\(.*\)\s*->.*\{", line):
            cur = re.match(
                r"^(?:ENTRY )?%([\w.\-]+)", line
            ).group(1)
            buf = [line]
            continue
        if cur is not None:
            buf.append(line)
            if line.rstrip() == "}":
                comps[cur] = "\n".join(buf)
                cur = None
    return comps


def _shape_of(name: str, body: str):
    m = re.search(r"%" + re.escape(name) + r" = \w+\[([0-9,]+)\]", body)
    if not m:
        m = re.search(re.escape(name) + r": \w+\[([0-9,]+)\]", body)
    return [int(x) for x in m.group(1).split(",")] if m else None


_CONV = re.compile(
    r"%[\w.\-]+ = \w+\[([0-9,]+)\][^\n]*? convolution"
    r"\(%([\w.\-]+), %([\w.\-]+)\)[^\n]*?window=\{size=(\S+?)[ }]"
)
_NESTED_FUSION = re.compile(
    r"%([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%([\w.\-]+)"
)


def _conv_flops_by_fusion(hlo: str):
    """Top-level fusion name -> (counted_gflops, [conv descriptions]).

    On TPU the conv and its requant epilogue compile into ONE kOutput
    fusion, and a whole double-conv block can nest further fusions — so
    convolutions are collected RECURSIVELY through ``calls=`` edges.
    Counted FLOPs are 2 * out_elems * prod(kernel_hw) * in_ch, i.e. what
    the MXU actually executes — for the dilated ConvTranspose lowering
    that is 4x the algorithmically useful work, which is exactly the
    point of reporting it this way.
    """
    comps = _parse_computations(hlo)
    fusion_calls = dict(_NESTED_FUSION.findall(hlo))

    def convs_in(comp_name, seen):
        if comp_name in seen or comp_name not in comps:
            return []
        seen.add(comp_name)
        body = comps[comp_name]
        found = []
        for m in _CONV.finditer(body):
            o = [int(x) for x in m.group(1).split(",")]
            k = _shape_of(m.group(3), body)
            found.append((o, k, m.group(4)))
        for nm in _NESTED_FUSION.finditer(body):
            found += convs_in(nm.group(2), seen)
        return found

    out = {}
    for name, comp in fusion_calls.items():
        convs = convs_in(comp, set())
        gf, desc = 0.0, []
        for o, k, w in convs:
            if k and len(o) == 4 and len(k) == 4:
                gf += 2.0 * o[0] * o[1] * o[2] * o[3] * k[0] * k[1] * k[2] / 1e9
                desc.append(f"{w}x{k[2]}->{k[3]}@{o[1]}x{o[2]}")
        if gf:
            out[name] = (gf, "; ".join(desc))
    return out


def profile(batch_size: int = 128, image_size: int = 256, features: int = 64,
            model: str = "unet", quant: str = "int8_deep"):
    import jax

    if model == "fastddpm":
        loop, q, xr = build_diffusion_loop(batch_size, image_size, quant)
    else:
        loop, q, xr = build_loop(batch_size, image_size, features)
    compiled = loop.lower(q, xr).compile()
    hlo = compiled.as_text()
    convs = _conv_flops_by_fusion(hlo)
    float(loop(q, xr))  # warm

    tmp = tempfile.mkdtemp(prefix="int8_profile_")
    with jax.profiler.trace(tmp):
        float(loop(q, xr + 1))

    trace_file = sorted(
        glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz")
    )[-1]
    with gzip.open(trace_file) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = [p for p, n in pids.items() if "TPU" in str(n)]
    if not tpu_pids:
        print(json.dumps({"error": "no TPU device events in trace"}))
        return
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name")
    dur = collections.Counter()
    n = collections.Counter()
    loop_total_ms = None
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        tname = tnames.get((e["pid"], e["tid"]), "")
        if tname == "XLA Ops":
            if e["name"].startswith("while"):
                # several while ops can appear (the diffusion sampler's
                # PRNG path carries a small one) — the scan loop is the
                # longest
                loop_total_ms = max(
                    loop_total_ms or 0.0, e.get("dur", 0) / 1e3
                )
            else:
                dur[e["name"]] += e.get("dur", 0)
                n[e["name"]] += 1

    rows = []
    for name, d in dur.most_common():
        per_iter_us = d / max(n[name], 1)
        gf, desc = convs.get(name, (None, ""))
        row = {
            "op": name,
            "per_iter_ms": round(per_iter_us / 1e3, 3),
            "calls": n[name],
        }
        if gf:
            ideal_ms = gf / V5E_INT8_PEAK_TOPS  # GFLOP / (TOPS) -> ms
            row["conv"] = desc
            row["gflops"] = round(gf, 1)
            row["ideal_ms"] = round(ideal_ms, 3)
            row["mxu_util"] = round(ideal_ms / (per_iter_us / 1e3), 3)
        rows.append(row)
    # both loops run 10 forwards, so per-forward time divides by 10 — but
    # the UNet loop processes a NEW batch per forward (10 batches of
    # slices per loop) while the diffusion chain's 10 forwards produce ONE
    # batch of sampled slices
    slices_per_loop = batch_size * (10 if model == "unet" else 1)
    print(json.dumps({
        "batch_size": batch_size,
        "loop_iter_total_ms": round(loop_total_ms / 10, 2)
        if loop_total_ms else None,
        "slices_per_sec_in_trace": round(
            slices_per_loop / (loop_total_ms / 1e3), 1
        ) if loop_total_ms else None,
        "ops": rows,
    }, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--model", default="unet", choices=("unet", "fastddpm"),
                   help="fastddpm profiles the int8 T=10 ancestral sampler "
                        "(mxu_util is vs the int8 peak — the float sites of "
                        "int8_deep read low by 2x there)")
    p.add_argument("--quant", default="int8_deep",
                   choices=("int8", "int8_deep"),
                   help="fastddpm only: which conv subset runs int8")
    a = p.parse_args()
    profile(a.batch_size, a.image_size, a.features, a.model, a.quant)
