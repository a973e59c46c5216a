"""Post-training int8 quantization of the Fast-DDPM sampling path.

Why: T=10 sampling is the diffusion model's serving cost — 10 sequential
UNet forwards per slice (`models/diffusion.py:sample_ancestral`, mirroring
`/root/reference/notebooks/FastDDPM_Training_Fixed.ipynb:cell13`).  The
bf16 sampler measures 77 slices/s at batch 128 (64 % MFU,
benchmarks/diffusion_sampling.py); the conv FLOPs are ~all of the model,
and v5e's MXU runs int8 at 2x the bf16 rate, so quantizing the convs is
the same single-chip lever the UNet serving path already uses
(serve/quant.py).

Scheme — the UNet path's symmetric PTQ, adapted to the DiffResBlock
topology (GroupNorm/SiLU + additive time projection,
`models/diffusion.py:DiffResBlock`):

- every conv runs int8 x int8 -> int32 on the MXU: init_conv, each block's
  conv1/conv2 and 1x1 channel-matching skip, the 3 ConvTranspose upconvs
  (kernel == stride, so they quantize like any matmul — serve/quant.py
  `_upconv_int8`), and final_conv;
- weights per-output-channel symmetric int8 (absmax / 127); activations
  per-conv **per-step** scales, calibrated over the REAL sampling
  trajectory (:func:`calibrate_fastddpm` runs the ancestral chain and
  records each site's absmax at every inference step; the apply maps the
  traced ``t`` to its schedule row).  Per-step matters: x_t statistics
  drift by orders of magnitude across the chain, and one static scale per
  site measured **−0.30 SSIM** end-to-end on the demo checkpoint vs
  **−0.0015** with the per-step tables (same throughput — the lookup is a
  scalar per trace step);
- GroupNorm, SiLU and the time MLP/projections stay bf16: GroupNorm is a
  data-dependent per-sample normalization (nothing to fold, unlike the
  UNet's BatchNorm), so activations can NOT stay int8-resident between
  convs here — each conv's input is quantized out of the float GN/SiLU
  chain (XLA fuses quantize into that elementwise chain) and its output
  is dequantized in the conv epilogue.  The win is pure MXU rate, not
  HBM traffic; the time MLP is a (B, 128) matmul — noise-floor FLOPs.

Measured (v5e, batch 128, T=10, benchmarks/diffusion_sampling.py;
accuracy deltas from benchmarks/diffusion_int8_accuracy.py on the demo
checkpoint, per-step scales):
bf16 76.8 slices/s (64.3 % MFU) -> all-sites int8 73.5 (NEGATIVE, and
−0.010 SSIM — the 256² level's quantize/requant traffic outweighs its
MXU gain, matching the UNet profile where 64-out-channel 256² convs run
at 37-69 % of ideal) -> :data:`DEEP_SITES`-only int8 **85.6 slices/s
(+11.4 %, 71.7 % MFU, −0.0015 SSIM)** — the serving recommendation
(docs/SERVING.md); batch 192 measured slower (81.6).

Unlike BatchNorm-folded serving there is no train/serve divergence to
manage: the quantized forward is the training forward with int8 convs.

Accuracy is measured per checkpoint like the UNet path
(benchmarks/diffusion_int8_accuracy.py -> results_demo/): quantization
noise feeds back through the 10-step chain, so the end-to-end SSIM delta —
not per-call eps error — is the serving contract.

The reference has no quantization anywhere (fp32 PyTorch throughout); this
is a TPU-serving addition.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrisr_tpu.models.diffusion import (
    DiffusionSchedule,
    TimeEmbedding,
)
from mrisr_tpu.serve.quant import _quantize_conv

_DN = ("NHWC", "HWIO", "NHWC")

# conv sites of FastDDPMUNet (models/diffusion.py), in forward order
_BLOCKS = ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1")
_UPCONVS = ("upconv3", "upconv2", "upconv1")


def _conv(x, kernel, *, preferred=None):
    """3x3 or 1x1 'SAME' conv (padding=1 on a 3x3 kernel == SAME)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=preferred,
    )


def _gn(x, p, groups: int, dtype):
    """Flax GroupNorm applied functionally — bit-identical to the module
    call inside FastDDPMUNet (same epsilon/param layout)."""
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype).apply(
        {"params": p}, x
    )


def _time_proj(t_emb, p, dtype):
    """DiffResBlock's additive time projection (Dense then broadcast)."""
    y = t_emb.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)
    return y[:, None, None, :]


def _forward_impl(params: Dict, x: jax.Array, t: jax.Array, dtype,
                  conv_fn, upconv_fn, time_dim: int, act_fn=None):
    """Shared FastDDPMUNet skeleton; ``conv_fn(site_name, x, raw_sub)`` and
    ``upconv_fn(site_name, x, raw_sub)`` select float-vs-int8 execution.
    ``act_fn(conv_site, x, norm_params, num_groups)`` produces the
    GroupNorm+SiLU activation feeding ``conv_site`` — the hook the fused
    Pallas GN kernel plugs into (it may hand conv_fn a pre-quantized
    :class:`_PreQuant` instead of a float tensor).

    Topology mirror of models/diffusion.py:FastDDPMUNet (M11,
    `/root/reference/notebooks/FastDDPM_Training_Fixed.ipynb:cell7`).
    """
    if act_fn is None:
        def act_fn(site, h, p, groups):
            return nn.silu(_gn(h, p, groups, dtype))

    t_emb = TimeEmbedding(time_dim, dtype=dtype).apply(
        {"params": params["time_emb"]}, t
    )

    def resblock(name, x):
        p = params[name]
        in_ch = x.shape[-1]
        feats = p["conv1"]["kernel"].shape[-1]
        h = act_fn(f"{name}/conv1", x, p["norm1"], max(1, in_ch // 4))
        h = conv_fn(f"{name}/conv1", h, p["conv1"])
        h = h + _time_proj(t_emb, p["time_fc"], dtype)
        h = act_fn(f"{name}/conv2", h, p["norm2"], max(1, feats // 4))
        h = conv_fn(f"{name}/conv2", h, p["conv2"])
        if "skip" in p:
            x = conv_fn(f"{name}/skip", x, p["skip"])
        return h + x

    h = conv_fn("init_conv", x, params["init_conv"])
    e1 = resblock("enc1", h)
    h = nn.max_pool(e1, (2, 2), strides=(2, 2))
    e2 = resblock("enc2", h)
    h = nn.max_pool(e2, (2, 2), strides=(2, 2))
    e3 = resblock("enc3", h)
    h = nn.max_pool(e3, (2, 2), strides=(2, 2))

    h = resblock("bottleneck", h)

    h = upconv_fn("upconv3", h, params["upconv3"])
    h = resblock("dec3", jnp.concatenate([h, e3], axis=-1))
    h = upconv_fn("upconv2", h, params["upconv2"])
    h = resblock("dec2", jnp.concatenate([h, e2], axis=-1))
    h = upconv_fn("upconv1", h, params["upconv1"])
    h = resblock("dec1", jnp.concatenate([h, e1], axis=-1))

    base = params["init_conv"]["kernel"].shape[-1]
    h = act_fn("final_conv", h, params["final_norm"], max(1, base // 4))
    h = conv_fn("final_conv", h, params["final_conv"])
    return h.astype(jnp.float32)


def fastddpm_float_apply(params: Dict, x: jax.Array, t: jax.Array,
                         dtype=jnp.float32, time_dim: int = 128,
                         stats: Dict | None = None, stat_fn=None):
    """Float forward on the raw param tree (+ optional per-conv-input range
    recording).  Equality with ``FastDDPMUNet.apply`` is tested
    (tests/test_quant_diffusion.py)."""
    if stat_fn is None:
        stat_fn = lambda a: jnp.max(jnp.abs(a)).astype(jnp.float32)  # noqa: E731

    def conv_fn(name, h, sub):
        if stats is not None:
            stats[name] = (
                jnp.maximum(stats[name], stat_fn(h)) if name in stats
                else stat_fn(h)
            )
        return _conv(h.astype(dtype), sub["kernel"].astype(dtype)) + sub[
            "bias"
        ].astype(dtype)

    def upconv_fn(name, h, sub):
        if stats is not None:
            stats[name] = (
                jnp.maximum(stats[name], stat_fn(h)) if name in stats
                else stat_fn(h)
            )
        y = jax.lax.conv_transpose(
            h.astype(dtype), sub["kernel"].astype(dtype), (2, 2), "VALID",
            dimension_numbers=_DN,
        )
        return y + sub["bias"].astype(dtype)

    return _forward_impl(params, x, t, dtype, conv_fn, upconv_fn, time_dim)


def calibrate_fastddpm(
    variables: Dict,
    schedule: DiffusionSchedule,
    cond_batches: List[jax.Array],
    key: jax.Array,
    dtype=jnp.bfloat16,
    time_dim: int = 128,
    percentile: float | None = None,
    sampler: str = "ancestral",
) -> Dict[str, np.ndarray]:
    """Per-conv-input absmax over the REAL T-step sampling trajectory.

    ``sampler='ancestral'`` (default) runs the same chain as
    ``sample_ancestral`` (FIX#2 posterior-mean semantics, `Fixed:cell13`);
    ``sampler='ddim_grid'`` runs the deterministic DDIM-grid chain the
    step-distilled students serve with (serve/distill_diffusion.py:
    sample_ddim_grid) — the two visit different x_t distributions, so a
    student bundle must calibrate on ITS sampler's trajectory.  Either way
    the stats-recording forward sees the x_t distribution the quantized
    sampler will actually see at every step — q_sample states are NOT a
    substitute early in the chain, where x_t carries accumulated model
    error.

    cond_batches: list of (B, H, W, 2) [pre, post] conditioning batches
    (a handful of real/validation pairs is enough).

    Returns PER-STEP ranges: ``{site: (T,) absmax per inference step}``
    plus the ``"__timesteps__"`` entry (the schedule's inference timestep
    values) that lets the quantized apply map a traced ``t`` back to its
    step row.  x_t statistics drift by orders of magnitude across the
    chain (x_999 is amplified by 1/sqrt(abar) while x_36 is near the data
    scale), so ONE static scale per site either clips the early steps or
    starves the late ones — measured on the demo checkpoint, static
    scales cost −0.3 SSIM end-to-end while per-step scales are the
    standard diffusion-PTQ remedy.

    ``percentile``: None records absmax (safe default); a value (e.g.
    99.9) records that percentile of |x| per site/step, clipping the
    activation outlier tail — A/B the end-to-end SSIM with
    benchmarks/diffusion_int8_accuracy.py before serving either way
    (same contract as the UNet path's ``calibrate_unet``).
    """
    if sampler not in ("ancestral", "ddim_grid"):
        raise ValueError(
            f"sampler must be 'ancestral' or 'ddim_grid', got {sampler!r}"
        )
    params = variables["params"]
    if percentile is None:
        stat_fn = None  # fastddpm_float_apply's absmax default
    else:
        stat_fn = lambda a: jnp.percentile(  # noqa: E731
            jnp.abs(a).astype(jnp.float32).reshape(-1), percentile
        )
    ts = schedule.timesteps
    n_steps = schedule.num_inference_steps
    order = np.arange(n_steps - 1, -1, -1)
    ts_np = np.asarray(ts)
    abar_all = np.asarray(schedule.alphas_cumprod)
    alphas_all = np.asarray(schedule.alphas)

    @jax.jit
    def fwd(x_in, t_batch):
        stats: Dict[str, jax.Array] = {}
        eps = fastddpm_float_apply(
            params, x_in, t_batch, dtype=dtype, time_dim=time_dim,
            stats=stats, stat_fn=stat_fn,
        )
        return eps, stats

    acc: Dict[str, np.ndarray] = {}
    for bi, cond in enumerate(cond_batches):
        b, h, w, _ = cond.shape
        k = jax.random.fold_in(key, bi)
        k_init, k_loop = jax.random.split(k)
        x = jax.random.normal(k_init, (b, h, w, 1), jnp.float32)
        for step_idx in order:  # descending, mirrors the serving sampler
            t_val = int(ts_np[step_idx])
            abar = float(abar_all[t_val])
            t_batch = jnp.full((b,), t_val, jnp.int32)
            eps, stats = fwd(jnp.concatenate([cond, x], axis=-1), t_batch)
            for name, v in jax.device_get(stats).items():
                row = acc.setdefault(name, np.zeros(n_steps, np.float32))
                row[step_idx] = max(row[step_idx], float(v))
            if sampler == "ddim_grid":
                # sample_ddim_grid's update: recompose x0/eps at the next
                # grid ᾱ (1.0 at the bottom), no noise injection
                abar_next = (
                    float(abar_all[int(ts_np[step_idx - 1])])
                    if step_idx > 0 else 1.0
                )
                x0 = (x - np.sqrt(1.0 - abar) * eps) / np.sqrt(abar)
                x = np.sqrt(abar_next) * x0 + np.sqrt(1.0 - abar_next) * eps
            else:
                x = (1.0 / np.sqrt(abar)) * (
                    x - (1.0 - abar) / np.sqrt(1.0 - abar) * eps
                )
                if step_idx > 0:
                    t_prev = int(ts_np[step_idx - 1])
                    abar_prev = float(abar_all[t_prev])
                    beta_t = 1.0 - float(alphas_all[t_val])
                    pvar = max(
                        (1.0 - abar_prev) / (1.0 - abar) * beta_t, 1e-20
                    )
                    z = jax.random.normal(
                        jax.random.fold_in(k_loop, t_val), x.shape,
                        jnp.float32,
                    )
                    x = x + np.sqrt(pvar) * z
    acc["__timesteps__"] = ts_np.astype(np.int32)
    return acc


def calibrate_fastddpm_inputs(
    variables: Dict,
    batches: List,
    dtype=jnp.bfloat16,
    time_dim: int = 128,
) -> Dict[str, float]:
    """Per-conv-input absmax over GIVEN forward inputs.

    batches: list of ``(x_in (B, H, W, 3), t (B,) int32)`` pairs — e.g.
    q_sample states built from ground-truth middles, or any representative
    (x_t, t) set.  Cheaper than the trajectory calibrator and independent
    of sampler behavior; prefer :func:`calibrate_fastddpm` for serving a
    trained checkpoint (it sees the x_t distribution the sampler actually
    visits, including accumulated model error), and this one when the
    model's own trajectory is not trustworthy or GT states are available.
    """
    params = variables["params"]

    @jax.jit
    def fwd(x_in, t_batch):
        stats: Dict[str, jax.Array] = {}
        fastddpm_float_apply(
            params, x_in, t_batch, dtype=dtype, time_dim=time_dim,
            stats=stats,
        )
        return stats

    acc: Dict[str, float] = {}
    for x_in, t in batches:
        for name, v in jax.device_get(fwd(x_in, t)).items():
            acc[name] = max(acc.get(name, 0.0), float(v))
    return acc


# the conv sites that run at <=128² spatial size — where the UNet int8
# profile measured the MXU at 87-98% of the int8 ideal (docs/SERVING.md);
# the 256² level is K/N-starved and measured int8-NEGATIVE here (all-sites
# int8 73.8 slices/s vs bf16 76.8; this subset 85.8 — see module docstring)
DEEP_SITES = (
    "enc2/conv1", "enc2/conv2", "enc2/skip",
    "enc3/conv1", "enc3/conv2", "enc3/skip",
    "bottleneck/conv1", "bottleneck/conv2",
    "upconv3", "dec3/conv1", "dec3/conv2", "dec3/skip",
    "upconv2", "dec2/conv1", "dec2/conv2", "dec2/skip",
)


def _quantize_site(kernel, bias, a_absmax) -> Dict:
    """One conv site's int8 tables.

    Scalar ``a_absmax`` (static calibration) -> the UNet-path record
    ({w_int8, a_scale, scale, bias}, fused dequant factor).  Per-step
    array (trajectory calibration) -> {w_int8, a_scale (T,), w_scale
    (per-out-channel), bias}: the dequant factor is assembled per step in
    the apply epilogue as ``a_scale[step] * w_scale``.
    """
    a = np.asarray(a_absmax, np.float32)
    rec = _quantize_conv(kernel, bias, float(a.max()))
    if a.ndim == 0:
        return rec
    return {
        "w_int8": rec["w_int8"],
        "a_scale": jnp.asarray(np.maximum(a, 1e-12) / 127.0),
        "w_scale": (rec["scale"] / rec["a_scale"]).astype(jnp.float32),
        "bias": rec["bias"],
    }


def quantize_fastddpm(variables: Dict, calib: Dict[str, float],
                      only=None) -> Dict:
    """Raw fp params + calibration -> int8 serving tree.

    Returns ``{"params": <bf16 copy of the full tree — GN/SiLU/time params
    read from here; bf16 conv kernels remain so the float forward can run
    from the same tree>, "int8": {site: tables}, ["timesteps": (T,)]}``
    (:func:`_quantize_site`; the ``timesteps`` row-lookup table is present
    when the calibration is the per-step trajectory kind).

    ``only``: optional iterable of site names — quantize just those convs
    (e.g. :data:`DEEP_SITES`); the apply fn runs the rest in float.
    """
    params = variables["params"]
    sites: Dict[str, Dict] = {}
    only_set = None if only is None else set(only)
    timesteps = calib.get("__timesteps__")

    def grab(name, sub):
        if only_set is not None and name not in only_set:
            return
        if name not in calib:
            raise KeyError(
                f"calibration is missing conv site {name!r} — calibrate "
                "with calibrate_fastddpm on the same topology"
            )
        sites[name] = _quantize_site(sub["kernel"], sub["bias"], calib[name])

    grab("init_conv", params["init_conv"])
    for blk in _BLOCKS:
        grab(f"{blk}/conv1", params[blk]["conv1"])
        grab(f"{blk}/conv2", params[blk]["conv2"])
        if "skip" in params[blk]:
            grab(f"{blk}/skip", params[blk]["skip"])
    for up in _UPCONVS:
        grab(up, params[up])
    grab("final_conv", params["final_conv"])

    p_bf16 = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if a.dtype == jnp.float32 else a,
        params,
    )
    out = {"params": p_bf16, "int8": sites}
    if timesteps is not None:
        out["timesteps"] = jnp.asarray(timesteps, jnp.int32)
    return out


class _PreQuant(NamedTuple):
    """An activation already emitted as int8 codes (by the fused Pallas GN
    kernel) together with the fused dequant factor its consumer conv's
    epilogue must apply."""

    q: jax.Array   # int8 codes
    dq: jax.Array  # a_scale(step) * per-out-channel w_scale


def _default_gn_impl() -> str:
    """GroupNorm lowering for the int8 sampler when the caller doesn't pick.

    'xla' — measured the faster END-TO-END choice on v5e despite the fused
    Pallas kernel (ops/groupnorm_pallas.py) being 2.9x faster than the XLA
    GN/SiLU/quantize chain in isolation: batch-128 int8 convs want their
    operands in the batch-inner {3,0,2,1} layout, XLA's elementwise fusions
    emit into that layout for free, and the layout-pinned custom call
    forces full-tensor transpose copies around every fused site — measured
    sampler throughput 85.6 (xla) vs 48.3 (pallas, all deep sites) / 53.0
    (128² sites only) / 67.9 (<=64² sites only) slices/s.  Full analysis
    in docs/SERVING.md; reproduce with
    ``benchmarks/diffusion_sampling.py --quant int8_deep --gn-impl …``."""
    return "xla"


def fastddpm_int8_apply(qtree: Dict, x: jax.Array, t: jax.Array,
                        dtype=jnp.bfloat16, time_dim: int = 128,
                        gn_impl: str | None = None):
    """int8-conv Fast-DDPM forward: (B, H, W, 3) + (B,) t -> (B, H, W, 1).

    Drop-in ``eps_fn`` for the samplers::

        q = quantize_fastddpm(variables, calibrate_fastddpm(...))
        out = sample_ancestral(lambda xi, ti: fastddpm_int8_apply(q, xi, ti),
                               cond, key, schedule)

    Every conv input is quantized out of the float GN/SiLU chain at its
    calibrated scale, runs int8 x int8 -> int32 on the MXU, and is
    dequantized (per-out-channel) + biased in the epilogue — XLA fuses
    both elementwise chains into the surrounding ops.

    With a per-step trajectory calibration (qtree carries ``timesteps``),
    each site's activation scale is looked up for THIS step: ``t`` (the
    batch-uniform original timestep value) maps to its schedule row via
    searchsorted, and ``a_scale[row]`` / ``a_scale[row] * w_scale`` feed
    the quantizer/dequantizer — scalar per-trace-step ops, noise-floor
    cost next to the convs.

    ``gn_impl``: 'xla' (the measured default, :func:`_default_gn_impl`)
    runs each GroupNorm/SiLU as XLA elementwise chains; 'pallas' fuses
    GN + SiLU + the following conv's input quantizer into one VMEM-resident
    pass (ops/groupnorm_pallas.py) at every eligible quantized site —
    kernel-faster but measured end-to-end SLOWER here because it pins the
    activation layout (see _default_gn_impl); kept opt-in for measurement.
    """
    params, sites = qtree["params"], qtree["int8"]
    ts_table = qtree.get("timesteps")
    row = None if ts_table is None else jnp.searchsorted(ts_table, t[0])
    if gn_impl is None:
        gn_impl = _default_gn_impl()

    def site_scale(lq):
        # jnp, not np: bundles load tables as numpy, which cannot be
        # indexed by the traced step row
        a = jnp.asarray(lq["a_scale"])
        if a.ndim:  # per-step table
            if row is None:
                raise ValueError(
                    "per-step a_scale tables need the 'timesteps' lookup "
                    "row in the qtree (quantize_fastddpm keeps it when the "
                    "calibration came from calibrate_fastddpm)"
                )
            return a[row], a[row] * lq["w_scale"]
        return a, lq["scale"]

    def qin_and_scale(h, lq):
        a_t, dq = site_scale(lq)
        q = jnp.clip(
            jnp.round(h.astype(jnp.float32) / a_t), -127, 127
        ).astype(jnp.int8)
        return q, dq

    def conv_fn(name, h, sub):
        lq = sites.get(name)
        if isinstance(h, _PreQuant):  # fused GN already emitted the codes
            y = _conv(h.q, lq["w_int8"], preferred=jnp.int32)
            return (y.astype(jnp.float32) * h.dq + lq["bias"]).astype(dtype)
        if lq is None:  # site not quantized (quantize_fastddpm(only=...))
            return _conv(h.astype(dtype), sub["kernel"].astype(dtype)) + sub[
                "bias"
            ].astype(dtype)
        q, dq = qin_and_scale(h, lq)
        y = _conv(q, lq["w_int8"], preferred=jnp.int32)
        return (y.astype(jnp.float32) * dq + lq["bias"]).astype(dtype)

    act_fn = None
    if gn_impl == "pallas":
        from mrisr_tpu.ops.groupnorm_pallas import (
            gn_pallas_eligible,
            groupnorm_silu_pallas,
        )

        def act_fn(site, h, p, groups):
            lq = sites.get(site)
            if lq is not None and gn_pallas_eligible(h.shape, groups):
                a_t, dq = site_scale(lq)
                q = groupnorm_silu_pallas(
                    h, p["scale"], p["bias"], num_groups=groups,
                    quant_scale=a_t,
                )
                return _PreQuant(q, dq)
            return nn.silu(_gn(h, p, groups, dtype))
    elif gn_impl != "xla":
        raise ValueError(f"gn_impl must be 'xla' or 'pallas', got {gn_impl!r}")

    def upconv_fn(name, h, sub):
        lq = sites.get(name)
        if lq is None:
            y = jax.lax.conv_transpose(
                h.astype(dtype), sub["kernel"].astype(dtype), (2, 2), "VALID",
                dimension_numbers=_DN,
            )
            return y + sub["bias"].astype(dtype)
        q, dq = qin_and_scale(h, lq)
        y = jax.lax.conv_transpose(
            q, lq["w_int8"], (2, 2), "VALID", dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * dq + lq["bias"]).astype(dtype)

    return _forward_impl(params, x, t, dtype, conv_fn, upconv_fn, time_dim,
                         act_fn=act_fn)
