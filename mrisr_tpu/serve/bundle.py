"""Serving bundles: export a quantized (or BN-folded bf16) UNet forward to
one portable artifact, loadable without the training checkpoint, the
original config, or recalibration.

Production-serving gap this closes: `engine_from_model` needs the Orbax
checkpoint tree AND live calibration batches at startup; a serving fleet
wants a single immutable artifact per deployed model.  A bundle is a
directory with

- ``arrays.npz``   — the serving param pytree, flattened with '/'-joined
  keys (int8 weight tables + fp32 scales/biases for quantized blocks,
  bf16 upconv/final params),
- ``meta.json``    — model name, base features, image size, quant mode,
  calibration description, creation info.

The reference has no serving story at all (notebook cells re-load
``*.pth`` files per run, `/root/reference/src/ModelLoader.py:642-711`);
this is a TPU-serving addition layered on serve/quant.py.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

_SEP = "/"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_bundle(
    path: str,
    params: Dict,
    *,
    model_name: str,
    quant: str,
    base_features: int,
    image_size: Tuple[int, int] = (256, 256),
    calibration: Optional[str] = None,
    extra: Optional[Dict] = None,
) -> str:
    """Write a serving bundle directory; returns its path.

    params: the serving pytree — ``quantize_unet(...)`` output for
    quant='int8'/'int8_fused', or a BN-folded ``{'params': ...}`` tree for
    quant='none'.
    """
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    # np.savez rejects bfloat16 — store as uint16 bit patterns + dtype tag
    tagged = {}
    bf16_keys = []
    for k, v in flat.items():
        if str(v.dtype) == "bfloat16":
            tagged[k] = v.view(np.uint16)
            bf16_keys.append(k)
        else:
            tagged[k] = v
    np.savez(os.path.join(path, "arrays.npz"), **tagged)
    meta = {
        "format_version": 1,
        "model_name": model_name,
        "quant": quant,
        "base_features": int(base_features),
        "image_size": list(image_size),
        "calibration": calibration,
        "bf16_keys": bf16_keys,
        **(extra or {}),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_bundle(path: str) -> Tuple[Dict, Dict]:
    """Read a bundle -> (serving param pytree, meta dict)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    import jax.numpy as jnp

    bf16 = set(meta.get("bf16_keys", ()))
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if k in bf16:
                v = jnp.asarray(v).view(jnp.bfloat16)
            flat[k] = v
    return _unflatten(flat), meta


def _reflatten_int8_sites(nested: Dict) -> Dict[str, Dict]:
    """Undo _unflatten's splitting of '/'-bearing conv-site names.

    int8 site names ("enc2/conv1", "upconv3", ...) contain the same
    separator the bundle flattener uses, so on load they come back as a
    nested tree; a site is recognizable as the dict holding the quantized
    conv record (``w_int8``), which is re-keyed by its joined path.
    """
    sites: Dict[str, Dict] = {}

    def walk(node, path):
        if "w_int8" in node:
            sites[_SEP.join(path)] = node
            return
        for k, v in node.items():
            walk(v, path + [k])

    walk(nested, [])
    return sites


def make_bundle_apply(params: Dict, meta: Dict):
    """Jitted serving forward for a loaded bundle.

    pair bundles: ``(B, H, W, 2) -> (B, H, W, 1)`` one-shot forward;
    diffusion bundles: same signature, but the call runs the full T-step
    ancestral sampling chain (fixed PRNG key per call — the api.py
    LoadedModel convention, so serving is deterministic per input).
    """
    import jax

    quant = meta["quant"]
    if meta.get("kind") == "diffusion":
        import jax.numpy as jnp

        from mrisr_tpu.models.diffusion import (
            DiffusionSchedule,
            sample_ancestral,
        )
        from mrisr_tpu.serve.quant_diffusion import (
            fastddpm_float_apply,
            fastddpm_int8_apply,
        )

        # read, don't pop: the caller's loaded tree stays intact so a
        # second make_bundle_apply on the same params works
        sched_arrays = params["schedule"]
        schedule = DiffusionSchedule(
            betas=jnp.asarray(sched_arrays["betas"], jnp.float32),
            alphas=jnp.asarray(sched_arrays["alphas"], jnp.float32),
            alphas_cumprod=jnp.asarray(
                sched_arrays["alphas_cumprod"], jnp.float32
            ),
            timesteps=jnp.asarray(sched_arrays["timesteps"], jnp.int32),
        )
        time_dim = int(meta["time_dim"])
        combine = meta.get("combine", "first")
        if quant in ("int8", "int8_deep"):
            qtree = {
                "params": params["params"],
                "int8": _reflatten_int8_sites(params["int8"]),
            }
            if "timesteps" in params:  # per-step a_scale row lookup
                qtree["timesteps"] = jnp.asarray(
                    params["timesteps"], jnp.int32
                )

            def eps_fn(x_in, t):
                return fastddpm_int8_apply(qtree, x_in, t, time_dim=time_dim)

        else:

            def eps_fn(x_in, t):
                return fastddpm_float_apply(
                    params["params"], x_in, t, dtype=jnp.bfloat16,
                    time_dim=time_dim,
                )

        if meta.get("sampler") == "ddim_grid":
            # step-distilled students (serve/distill_diffusion.py) were
            # trained to reproduce the teacher under THIS deterministic
            # sampler — the ancestral chain would add noise the student's
            # one-step-per-grid-point objective never saw
            from mrisr_tpu.serve.distill_diffusion import sample_ddim_grid

            return jax.jit(
                lambda cond: sample_ddim_grid(
                    eps_fn, cond, jax.random.PRNGKey(0), schedule
                )
            )
        return jax.jit(
            lambda cond: sample_ancestral(
                eps_fn, cond, jax.random.PRNGKey(0), schedule,
                combine=combine,
            )
        )
    if quant in ("int8", "int8_fused"):
        from mrisr_tpu.serve.quant import (
            unet_int8_apply,
            unet_int8_fused_apply,
        )

        fwd = unet_int8_fused_apply if quant == "int8_fused" else unet_int8_apply
        return jax.jit(lambda x: fwd(params, x))
    # BN-folded float path: this rebuilds UNet(use_bn=False), so the bundle
    # MUST hold a folded UNet-family tree — Flax would silently ignore
    # leftover BatchNorm params and serve a wrong forward otherwise
    from mrisr_tpu.serve.quant import _require_folded_unet

    _require_folded_unet(params.get("params", {}), "make_bundle_apply")
    import jax.numpy as jnp

    from mrisr_tpu.models import UNet

    module = UNet(
        features=meta["base_features"], use_bn=False,
        dtype=jnp.bfloat16,
    )
    return jax.jit(
        lambda x: module.apply(params, x, train=False).astype(jnp.float32)
    )


def export_serving_bundle(
    out_path: str,
    model_name: str = "unet",
    models_dir: str = "models",
    quant: str = "int8_fused",
    calibration_batches=None,
    percentile: Optional[float] = None,
    cfg=None,
    image_size: Tuple[int, int] = (256, 256),
) -> str:
    """Checkpoint -> BN-fold -> (optionally) quantize -> bundle on disk."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.api import load_model

    loaded = load_model(
        model_name, models_dir=models_dir, checkpoint="required",
        image_size=image_size, cfg=cfg, fold_bn=True,
    )
    if loaded.kind == "diffusion":
        return _export_diffusion_bundle(
            out_path, loaded, quant=quant,
            calibration_batches=calibration_batches, image_size=image_size,
            percentile=percentile,
        )
    if loaded.kind != "pair":
        raise ValueError(
            f"serving bundles cover 2-in/1-out pair models and the fastddpm "
            f"diffusion family; {model_name!r} is kind={loaded.kind!r}"
        )
    from mrisr_tpu.serve.quant import _require_folded_unet

    # bundles always rebuild the UNet-family forward at load time, so the
    # float path has the same topology requirement as the int8 path
    _require_folded_unet(
        loaded.variables.get("params", {}), "export_serving_bundle"
    )
    features = int(
        loaded.variables["params"]["enc1"]["Conv_0"]["kernel"].shape[-1]
    )
    if quant not in ("none", "int8", "int8_fused"):
        # reject rather than silently exporting a bf16 bundle whose meta
        # claims the requested quant mode
        raise ValueError(
            f"pair-model bundles support quant none/int8/int8_fused, got "
            f"{quant!r} (int8_deep is the diffusion-sampler path)"
        )
    if quant in ("int8", "int8_fused"):
        from mrisr_tpu.serve.quant import calibrate_unet, quantize_unet

        if not calibration_batches:
            raise ValueError("int8 bundles need calibration_batches")
        calib = calibrate_unet(
            loaded.variables, calibration_batches, percentile=percentile
        )
        params = quantize_unet(loaded.variables, calib)
        calib_desc = (
            f"{len(calibration_batches)} batches, "
            + ("absmax" if percentile is None else f"p{percentile}")
        )
    else:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            loaded.variables,
        )
        calib_desc = None
    return save_bundle(
        out_path, params, model_name=model_name, quant=quant,
        base_features=features, image_size=image_size,
        calibration=calib_desc,
    )


def _export_diffusion_bundle(
    out_path: str,
    loaded,
    *,
    quant: str,
    calibration_batches,
    image_size: Tuple[int, int],
    percentile: Optional[float] = None,
) -> str:
    """Fast-DDPM (M11) serving bundle: the T-step ancestral sampler as one
    artifact.  quant: 'none' (bf16), 'int8' (every conv), or 'int8_deep'
    (the <=128² DEEP_SITES subset — the only variant measured FASTER than
    bf16, +11.4 %; docs/SERVING.md diffusion section)."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.serve.quant_diffusion import (
        DEEP_SITES,
        calibrate_fastddpm,
        quantize_fastddpm,
    )

    if loaded.name == "fastddpm_simple":
        # M10's SimpleDiffusionUNet is a different topology than the
        # M11 skeleton the quant/float mirror reimplements
        raise ValueError(
            "diffusion bundles cover the fastddpm (M11) family; "
            "fastddpm_simple has no bundle path"
        )
    if quant not in ("none", "int8", "int8_deep"):
        raise ValueError(
            f"diffusion bundles support quant none/int8/int8_deep, "
            f"got {quant!r} (int8_fused is the pair-UNet path; the "
            f"GroupNorm topology cannot keep activations int8-resident)"
        )
    variables = loaded.variables
    # final Dense of the time MLP outputs the embedding dim
    time_dim = int(
        variables["params"]["time_emb"]["Dense_1"]["kernel"].shape[-1]
    )
    sampler = loaded.sampler or "ancestral"
    if quant in ("int8", "int8_deep"):
        if not calibration_batches:
            raise ValueError("int8 bundles need calibration_batches")
        ranges = calibrate_fastddpm(
            variables, loaded.schedule, calibration_batches,
            jax.random.PRNGKey(0), time_dim=time_dim, percentile=percentile,
            sampler=sampler,
        )
        params = quantize_fastddpm(
            variables, ranges,
            only=DEEP_SITES if quant == "int8_deep" else None,
        )
        calib_desc = (
            f"{len(calibration_batches)} cond batches, trajectory "
            + ("absmax" if percentile is None else f"p{percentile}")
        )
    else:
        params = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(a, jnp.bfloat16)
                if a.dtype == jnp.float32 else a,
                variables["params"],
            )
        }
        calib_desc = None
    # ship the exact sampling schedule tables — reconstruction from config
    # at load time could drift from what the model was evaluated with
    sched = loaded.schedule
    params = dict(params)
    params["schedule"] = {
        "betas": np.asarray(sched.betas),
        "alphas": np.asarray(sched.alphas),
        "alphas_cumprod": np.asarray(sched.alphas_cumprod),
        "timesteps": np.asarray(sched.timesteps),
    }
    base_ch = int(variables["params"]["init_conv"]["kernel"].shape[-1])
    return save_bundle(
        out_path, params, model_name=loaded.name, quant=quant,
        base_features=base_ch, image_size=image_size,
        calibration=calib_desc,
        extra={"kind": "diffusion", "time_dim": time_dim,
               "combine": "first", "sampler": sampler},
    )


def engine_from_bundle(path: str, batch_size: int = 128,
                       data_parallel: bool = False, **engine_kwargs):
    """One-call serving: bundle dir -> running InferenceEngine.

    data_parallel=True shards each micro-batch over all local devices
    (engine.data_parallel_apply) — works for pair and diffusion bundles
    alike; batch_size must divide by the device count."""
    from mrisr_tpu.serve.engine import InferenceEngine, data_parallel_apply

    params, meta = load_bundle(path)
    apply_fn = make_bundle_apply(params, meta)
    if data_parallel:
        apply_fn = data_parallel_apply(apply_fn, batch_size)
    h, w = meta["image_size"]
    return InferenceEngine(
        apply_fn, batch_size=batch_size, input_shape=(h, w, 2),
        **engine_kwargs,
    )
