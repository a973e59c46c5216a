"""Public API: the reference's contract, drop-in.

``load_model(name)`` mirrors `/root/reference/src/ModelLoader.py:642-711`
(checkpoint search in ``models/``, three torch dict layouts via the
converter) and the returned :class:`LoadedModel` keeps the reference's NCHW
``(B, 2, H, W) -> (B, 1, H, W)`` call contract.  Internally everything is
NHWC on TPU; the adapters are free transposes fused by XLA.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from mrisr_tpu.config import ModelConfig
from mrisr_tpu.models.diffusion import (
    DiffusionSchedule,
    FastNoiseSchedule,
    sample_ancestral,
    sample_ddim,
)
from mrisr_tpu.models.registry import MODEL_REGISTRY, init_model


def _nchw_to_nhwc(x):
    return jnp.moveaxis(jnp.asarray(x, jnp.float32), 1, -1)


def _nhwc_to_nchw(x):
    return jnp.moveaxis(x, -1, 1)


@dataclass
class LoadedModel:
    """An eval-ready model with the reference's NCHW call contract."""

    name: str
    module: Any
    variables: dict
    kind: str  # 'pair' | 'window' | 'diffusion'
    schedule: Optional[DiffusionSchedule] = None
    # 'ddim_grid' = deterministic DDIM over schedule.timesteps (the
    # step-distilled students, serve/distill_diffusion.py); None = the
    # lineage's own sampler (ancestral / compressed-T DDIM)
    sampler: Optional[str] = None

    def __post_init__(self):
        if self.kind == "diffusion":
            if self.sampler == "ddim_grid":
                from mrisr_tpu.serve.distill_diffusion import sample_ddim_grid

                def _sample(variables, cond_nhwc, key):
                    eps = lambda x_in, t: self.module.apply(  # noqa: E731
                        variables, x_in, t
                    )
                    return sample_ddim_grid(eps, cond_nhwc, key, self.schedule)

            elif self.name == "fastddpm_simple":
                # the ModelLoader M10 lineage: compressed-T schedule, DDIM
                # sampler, [x, cond] input order (ModelLoader.py:604-636)
                if self.schedule is None:
                    self.schedule = FastNoiseSchedule.create(10)

                def _sample(variables, cond_nhwc, key):
                    eps = lambda x_in, t: self.module.apply(  # noqa: E731
                        variables, x_in, t
                    )
                    return sample_ddim(eps, cond_nhwc, key, self.schedule)

            else:
                if self.schedule is None:
                    self.schedule = DiffusionSchedule.create()

                def _sample(variables, cond_nhwc, key):
                    eps = lambda x_in, t: self.module.apply(  # noqa: E731
                        variables, x_in, t
                    )
                    return sample_ancestral(
                        eps, cond_nhwc, key, self.schedule, combine="first"
                    )

            self._jit_sample = jax.jit(_sample)
        else:
            self._jit_apply = jax.jit(
                lambda variables, x: self.module.apply(variables, x, train=False)
            )

    # ----------------------------------------------------------- NCHW API
    def __call__(self, x_nchw, key: Optional[jax.Array] = None):
        """pair: (B, 2, H, W) -> (B, 1, H, W); window: (B, 5, H, W) ->
        3-tuple of (B, 1, H, W); diffusion: (B, 2, H, W) cond -> sampled
        (B, 1, H, W)."""
        x = _nchw_to_nhwc(x_nchw)
        if self.kind == "diffusion":
            key = key if key is not None else jax.random.PRNGKey(0)
            out = self._jit_sample(self.variables, x, key)
            return _nhwc_to_nchw(out)
        out = self._jit_apply(self.variables, x)
        if isinstance(out, tuple):
            return tuple(_nhwc_to_nchw(o) for o in out)
        return _nhwc_to_nchw(out)

    def predict_nhwc(self, x):
        """NHWC fast path used by eval/volume_eval.py."""
        if self.kind == "diffusion":
            return self._jit_sample(self.variables, x, jax.random.PRNGKey(0))
        return self._jit_apply(self.variables, x)

    def sample(self, cond_nchw, key: Optional[jax.Array] = None):
        assert self.kind == "diffusion"
        return self(cond_nchw, key)


# Reference checkpoint filename map (ModelLoader.py:662-669)
_TORCH_CKPT_FILES = {
    "unet": "unet_best.pt",
    "unet_combined": "unet_combined_best.pt",
    "deepcnn": "deepcnn_best.pt",
    "progressive_unet": "progressive_unet_best.pt",
    "unet_gan": "unet_gan_best.pt",
    "fastddpm": "fastddpm_best.pt",
    # M10 lineage ships as fastddpm_advanced_best.pth (ModelLoader.py:668)
    "fastddpm_simple": "fastddpm_advanced_best.pth",
}


def load_model(
    model_name: str,
    models_dir: str = "models",
    checkpoint: Optional[str] = None,
    cfg: Optional[ModelConfig] = None,
    image_size: Tuple[int, int] = (256, 256),
    fold_bn: bool = False,
) -> LoadedModel:
    """Load the best checkpoint for ``model_name``.

    Search order: explicit ``checkpoint`` path; Orbax dir
    ``<models_dir>/<name>_best``; reference torch file
    ``<models_dir>/<torch name>`` (converted on the fly).  With no
    checkpoint found, returns a freshly initialized model (useful for tests
    and cold starts) — the reference instead raised; pass
    ``checkpoint='required'`` to get that behavior.
    """
    name = model_name.lower()
    m = re.fullmatch(r"(.+)_steps(\d+)", name)
    if m and m.group(1) in MODEL_REGISTRY:
        # step-distilled students always load from <models_dir>/<name>_best
        # plus the _grid.json sidecar — an explicit `checkpoint` path has no
        # sidecar to pair with, so honoring it silently would sample on the
        # wrong grid; reject instead of ignoring ('required' is the default
        # behavior here anyway: a missing checkpoint raises below)
        if checkpoint and checkpoint != "required":
            raise ValueError(
                f"{model_name}: step-distilled models resolve their "
                "checkpoint AND timestep-grid sidecar from models_dir; "
                "pass models_dir instead of an explicit checkpoint path"
            )
        return _load_step_distilled(
            name, m.group(1), int(m.group(2)), models_dir, cfg, image_size
        )
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model: {model_name}. Choose from: {sorted(MODEL_REGISTRY)}"
        )
    module, variables, kind = init_model(name, cfg, image_size=image_size)

    require = checkpoint == "required"
    if require:
        checkpoint = None

    orbax_path = os.path.join(models_dir, f"{name}_best")
    torch_path = os.path.join(models_dir, _TORCH_CKPT_FILES.get(name, ""))

    if checkpoint:
        # an EXPLICIT path must exist — silently falling back to another
        # checkpoint (or fresh weights) would report metrics for the wrong
        # model on a simple typo
        if not os.path.exists(checkpoint):
            raise FileNotFoundError(f"checkpoint not found: {checkpoint}")
        variables = _load_any(name, checkpoint, variables)
    elif os.path.isdir(orbax_path):
        variables = _load_orbax(orbax_path, variables)
    elif _TORCH_CKPT_FILES.get(name) and os.path.exists(torch_path):
        variables = _load_torch(name, torch_path)
    elif require:
        raise FileNotFoundError(
            f"Checkpoint not found for {name} in {models_dir}"
        )

    # serving optimization: fold BN affine + running stats into conv weights
    # (ckpt/fold_bn.py) — numerically exact, removes 18 elementwise passes
    if (
        fold_bn
        and name in ("unet", "unet_combined", "unet_gan", "unet_distilled")
        and variables.get("batch_stats")
    ):
        from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
        from mrisr_tpu.models.unet import UNet as _UNet

        variables = fold_unet_batchnorm(
            variables["params"], variables["batch_stats"]
        )
        module = _UNet(
            out_channels=(cfg or ModelConfig()).out_channels,
            # read the width from the weights, not the (possibly defaulted)
            # cfg — the unet_distilled student is narrower than 64
            features=int(
                variables["params"]["enc1"]["Conv_0"]["kernel"].shape[-1]
            ),
            use_bias=(name != "unet_gan"),
            use_bn=False,
            dtype=module.dtype,
        )
    schedule = None
    if kind == "diffusion" and name != "fastddpm_simple":
        # build the sampling schedule from the model's CONFIG — the
        # trained fastddpm presets use cosine β (config.py notes the
        # reference's training loop actually did), and sampling with
        # LoadedModel's former create() default (linear) silently
        # mismatched the trained posterior
        from mrisr_tpu.config import PRESETS

        mcfg = cfg or (
            PRESETS[name].model if name in PRESETS else ModelConfig(name=name)
        )
        schedule = DiffusionSchedule.create(
            num_timesteps=mcfg.num_timesteps,
            num_inference_steps=mcfg.num_inference_steps,
            beta_schedule=mcfg.beta_schedule,
            selection=mcfg.timestep_selection,
        )
    return LoadedModel(name=name, module=module, variables=variables,
                       kind=kind, schedule=schedule)


def _load_step_distilled(
    name: str,
    base: str,
    n_steps: int,
    models_dir: str,
    cfg: Optional[ModelConfig],
    image_size: Tuple[int, int],
) -> LoadedModel:
    """Step-distilled Fast-DDPM students (``cli distill-steps``,
    serve/distill_diffusion.py): model name ``<base>_steps<N>`` resolves to
    the BASE architecture's weights in ``<name>_best`` plus a
    ``<name>_grid.json`` sidecar carrying the student's timestep grid;
    sampling is deterministic DDIM over that grid (the distillation
    objective), not the base lineage's ancestral chain.
    """
    import json as _json

    if base == "fastddpm_simple":
        raise ValueError(
            "step-distillation targets the Fixed lineage ([pre, post, x] "
            "input order); fastddpm_simple is not supported"
        )
    module, variables, kind = init_model(base, cfg, image_size=image_size)
    if kind != "diffusion":
        raise ValueError(f"{name}: step-distilled students must be diffusion "
                         f"models, {base} is kind={kind!r}")
    orbax_path = os.path.join(models_dir, f"{name}_best")
    grid_path = os.path.join(models_dir, f"{name}_grid.json")
    if not os.path.isdir(orbax_path) or not os.path.exists(grid_path):
        raise FileNotFoundError(
            f"step-distilled checkpoint needs both {orbax_path}/ and "
            f"{grid_path} (produced by: cli distill-steps --teacher {base})"
        )
    variables = _load_orbax(orbax_path, variables)
    with open(grid_path) as f:
        sidecar = _json.load(f)
    timesteps = sidecar["timesteps"]
    if len(timesteps) != n_steps:
        raise ValueError(
            f"{grid_path} carries {len(timesteps)} timesteps but the model "
            f"name says {n_steps}"
        )
    from dataclasses import replace as _dc_replace

    from mrisr_tpu.config import PRESETS

    mcfg = cfg or (
        PRESETS[base].model if base in PRESETS else ModelConfig(name=base)
    )
    # a corrupt sidecar must fail loudly: out-of-range t would clamp-index
    # into alphas_cumprod and silently sample with the wrong ᾱ, and
    # sample_ddim_grid assumes a strictly ascending grid
    if not all(0 <= int(t) < mcfg.num_timesteps for t in timesteps):
        raise ValueError(
            f"{grid_path}: timesteps must lie in [0, {mcfg.num_timesteps}), "
            f"got {timesteps}"
        )
    if any(b <= a for a, b in zip(timesteps, timesteps[1:])):
        raise ValueError(
            f"{grid_path}: timesteps must be strictly ascending, "
            f"got {timesteps}"
        )
    full = DiffusionSchedule.create(
        num_timesteps=mcfg.num_timesteps,
        num_inference_steps=mcfg.num_inference_steps,
        beta_schedule=mcfg.beta_schedule,
        selection=mcfg.timestep_selection,
    )
    schedule = _dc_replace(full, timesteps=jnp.asarray(timesteps, jnp.int32))
    return LoadedModel(name=name, module=module, variables=variables,
                       kind=kind, schedule=schedule, sampler="ddim_grid")


def _load_orbax(path: str, template_variables: dict) -> dict:
    from mrisr_tpu.ckpt import restore_checkpoint

    # restore WITHOUT a template: trainer checkpoints carry extra fields
    # (opt_state, epoch, ...) that a params-only template would reject;
    # Orbax's saved metadata reconstructs dtypes.
    del template_variables
    restored = restore_checkpoint(path)
    if "generator" in restored:
        # GANTrainer layout ({generator: {...}, discriminator: {...}}) —
        # inference loads the generator, mirroring the reference's
        # `generator_state_dict` convention (V5, ModelLoader.py:693-705)
        restored = restored["generator"]
    out = {"params": restored["params"]}
    bs = restored.get("batch_stats")
    if bs:
        out["batch_stats"] = bs
    return out


def _load_torch(name: str, path: str) -> dict:
    import torch

    from mrisr_tpu.ckpt import convert_torch_checkpoint

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_checkpoint(name, ckpt)


def _load_any(name: str, path: str, template_variables: dict) -> dict:
    if os.path.isdir(path):
        return _load_orbax(path, template_variables)
    return _load_torch(name, path)
