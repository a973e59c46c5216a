"""Fast-DDPM trainer (T5/T7).

Config parity with the Fixed notebook
(`/root/reference/notebooks/FastDDPM_Training_Fixed.ipynb`): AdamW lr 2e-5,
grad clip 1.0 (in the optax chain), antithetic train timesteps, fixed
linspace validation timesteps, per-epoch resumable checkpoints with
auto-resume (``get_latest_checkpoint``), best-model tracking by val loss.
Sampling goes through models/diffusion.py's ``lax.scan`` samplers.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.config import Config
from mrisr_tpu.models.diffusion import (
    DiffusionSchedule,
    FastNoiseSchedule,
    sample_ancestral,
    sample_ddim,
)
from mrisr_tpu.models.registry import init_model
from mrisr_tpu.train.history import TrainingHistory
from mrisr_tpu.train.state import create_train_state, make_optimizer
from mrisr_tpu.train.steps import (
    make_diffusion_steps,
    make_simple_diffusion_steps,
)
from mrisr_tpu.train.trainer import _EpochLoopMixin, _mean_metrics


class DiffusionTrainer(_EpochLoopMixin):
    """Covers both lineages by ``config.model.name``:

    - 'fastddpm' (M11, default): 1000-step DDPMScheduler + selection,
      antithetic t over the selected steps, ancestral sampling
      (Fixed:cell11/cell13 semantics);
    - 'fastddpm_simple' (M10): compressed-T FastNoiseSchedule, [x, cond]
      input order, DDIM sampling (ModelLoader.py:466-636).
    """

    def __init__(self, config: Config, image_size=(256, 256), mesh=None,
                 steps_per_epoch: Optional[int] = None):
        """``steps_per_epoch`` enables the v2-notebook CosineAnnealingLR
        variant when ``config.train.lr_schedule == 'cosine'``."""
        self.config = config
        self.mesh = mesh
        dtype = (
            jnp.bfloat16 if config.train.compute_dtype == "bfloat16"
            else jnp.float32
        )
        name = config.model.name
        self.simple = name == "fastddpm_simple"
        self.model, variables, _ = init_model(
            name if self.simple else "fastddpm", config.model, dtype=dtype,
            image_size=image_size, seed=config.train.seed,
        )
        if self.simple:
            self.schedule = FastNoiseSchedule.create(
                config.model.num_inference_steps
            )
            steps = lambda **kw: make_simple_diffusion_steps(  # noqa: E731
                self.schedule, **kw
            )
        else:
            self.schedule = DiffusionSchedule.create(
                num_timesteps=config.model.num_timesteps,
                num_inference_steps=config.model.num_inference_steps,
                beta_schedule=config.model.beta_schedule,
                selection=config.model.timestep_selection,
            )
            steps = lambda **kw: make_diffusion_steps(  # noqa: E731
                self.schedule, **kw
            )
        self.state = create_train_state(
            self.model, variables,
            make_optimizer(config.train, steps_per_epoch=steps_per_epoch),
        )
        if mesh is not None:
            from mrisr_tpu.parallel.mesh import replicated

            self.state = jax.device_put(self.state, replicated(mesh))
        self.train_step, self.eval_step = steps(
            donate=config.train.donate_batch
        )
        self._raw_train_step, _ = steps(jit_steps=False)
        self._device_runner = None
        self.key = jax.random.PRNGKey(config.train.seed)
        self.history = TrainingHistory(json.loads(config.to_json()))

        def _sample_first(params, cond, key):
            eps = lambda x_in, t: self.model.apply(  # noqa: E731
                {"params": params}, x_in, t
            )
            if self.simple:
                return sample_ddim(eps, cond, key, self.schedule)
            return sample_ancestral(eps, cond, key, self.schedule, combine="first")

        self._jit_sample = jax.jit(_sample_first)

    def _eps_fn(self, x_in, t):
        return self.model.apply({"params": self.state.params}, x_in, t)

    def enable_device_epochs(self, bank, plan_flat, augment=None) -> None:
        """Train epochs as one on-device lax.scan (train/device_epoch.py);
        the diffusion step draws noise/timesteps from a per-step key."""
        super().enable_device_epochs(
            bank, plan_flat, augment=augment, step_takes_key=True
        )

    def run_epoch(self, loader: Iterable, train: bool, epoch: int) -> Dict[str, float]:
        if train and self._device_runner is not None:
            key = jax.random.fold_in(self.key, epoch)
            self.state, metrics = self._device_runner.run_epoch(self.state, key)
            return {k: float(v) for k, v in metrics.items()}
        acc: Dict[str, float] = {}
        n = 0
        base = jax.random.fold_in(self.key, epoch * 2 + (0 if train else 1))
        for i, batch in enumerate(loader):
            bkey = jax.random.fold_in(base, i)
            if train:
                self.state, metrics = self.train_step(self.state, batch, bkey)
            else:
                metrics = self.eval_step(self.state, batch, bkey)
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        return _mean_metrics(acc, n)

    # ---------------------------------------------------------------- sample
    def sample(
        self, cond: jax.Array, key: Optional[jax.Array] = None,
        num_samples: int = 3, combine: str = "first",
    ) -> jax.Array:
        """cond: (B, H, W, 2) [pre, post] -> (B, H, W, 1) generated middle.

        Default matches the Fixed notebook: 3 nominal samples, return first
        (`Fixed:cell13`); 'mean' gives the v2 behavior.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        if combine == "first" or self.simple:
            # the simple (M10) lineage samples deterministically via DDIM —
            # 'mean'/'first' over repeats would be identical draws
            return self._jit_sample(self.state.params, cond, key)
        return sample_ancestral(
            self._eps_fn, cond, key, self.schedule,
            num_samples=num_samples, combine=combine,
        )

    # ------------------------------------------------------------------ ckpt
    def _state_dict(self, epoch: int, best_loss: float) -> dict:
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step),
            "epoch": np.asarray(epoch),
            "best_loss": np.asarray(best_loss, np.float64),
        }

    def save(self, path: str, epoch: int, best_loss: float,
             async_: bool = False) -> None:
        from mrisr_tpu.ckpt import save_checkpoint

        save_checkpoint(path, self._state_dict(epoch, best_loss), async_=async_)

    def load(self, path: str) -> None:
        from mrisr_tpu.ckpt import restore_checkpoint

        template = self._state_dict(0, 0.0)
        r = restore_checkpoint(path, template)
        self.state = self.state.replace(
            params=r["params"], opt_state=r["opt_state"], step=int(r["step"])
        )
        self.best_loss = float(r["best_loss"])
        self.start_epoch = int(r["epoch"]) + 1

    # try_resume inherited from _EpochLoopMixin (Fixed:cell9 semantics)
