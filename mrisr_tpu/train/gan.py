"""UNet-GAN trainer: LSGAN + conditional PatchGAN (T3).

Config parity with ``results/unet_gan_history.json``: lr_G = lr_D = 2e-4,
λ_l1/λ_perc/λ_adv = 1.0/0.1/0.01, batch 4, augmentation on, early stop
patience 5; logged per-loss train histories g/d/l1/perc/adv and val
g/d/l1/perc/adv losses, matching the artifact's key layout.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from mrisr_tpu.config import Config
from mrisr_tpu.models.registry import init_model
from mrisr_tpu.train.history import TrainingHistory
from mrisr_tpu.train.state import create_train_state, make_optimizer
from mrisr_tpu.train.steps import make_gan_steps
from mrisr_tpu.train.trainer import _EpochLoopMixin, _mean_metrics


class GANTrainer(_EpochLoopMixin):
    def __init__(
        self,
        config: Config,
        perceptual_fn: Optional[Callable] = None,
        image_size=(256, 256),
        mesh=None,
        steps_per_epoch=None,
    ):
        self.config = config
        self.mesh = mesh
        import jax.numpy as jnp

        dtype = (
            jnp.bfloat16 if config.train.compute_dtype == "bfloat16"
            else jnp.float32
        )
        gen, g_vars, _ = init_model(
            "unet_gan", config.model, dtype=dtype, image_size=image_size,
            seed=config.train.seed,
        )
        disc, d_vars, _ = init_model(
            "patchgan", config.model, dtype=dtype, image_size=image_size,
            seed=config.train.seed + 1,
        )
        self.gen, self.disc = gen, disc
        self.g_state = create_train_state(
            gen, g_vars,
            make_optimizer(config.train, steps_per_epoch=steps_per_epoch),
        )
        self.d_state = create_train_state(
            disc, d_vars,
            make_optimizer(config.train, learning_rate=config.train.learning_rate_d,
                           steps_per_epoch=steps_per_epoch),
        )
        if mesh is not None:
            from mrisr_tpu.parallel.mesh import replicated

            self.g_state = jax.device_put(self.g_state, replicated(mesh))
            self.d_state = jax.device_put(self.d_state, replicated(mesh))
        step_kwargs = dict(
            perceptual_fn=perceptual_fn,
            lambda_l1=config.loss.lambda_l1,
            lambda_perceptual=config.loss.lambda_perceptual,
            lambda_adversarial=config.loss.lambda_adversarial,
        )
        self.train_step, self.eval_step = make_gan_steps(
            donate=config.train.donate_batch, **step_kwargs
        )
        self._raw_train_step, _ = make_gan_steps(
            jit_steps=False, **step_kwargs
        )
        self._device_runner = None
        self.history = TrainingHistory(json.loads(config.to_json()))

    def enable_device_epochs(self, bank, plan_flat, augment=None) -> None:
        """Train epochs as one on-device lax.scan; the carry holds BOTH
        TrainStates (G, D) — train/device_epoch.py multi_state mode."""
        super().enable_device_epochs(
            bank, plan_flat, augment=augment, multi_state=True
        )

    def run_epoch(self, loader: Iterable, train: bool, epoch: int) -> Dict[str, float]:
        if train and self._device_runner is not None:
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.config.train.seed), epoch
            )
            (self.g_state, self.d_state), metrics = (
                self._device_runner.run_epoch((self.g_state, self.d_state), key)
            )
            out = {k: float(v) for k, v in metrics.items()}
            out["loss"] = out.get("g", 0.0)
            return out
        acc: Dict[str, float] = {}
        n = 0
        for batch in loader:
            if train:
                self.g_state, self.d_state, metrics = self.train_step(
                    self.g_state, self.d_state, batch
                )
            else:
                metrics = self.eval_step(self.g_state, self.d_state, batch)
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        out = _mean_metrics(acc, n)
        # epoch-loop contract: expose a scalar 'loss' (G objective) for
        # early stopping, mirroring the reference's val g_loss criterion
        out["loss"] = out.get("g", out.get("g_loss", 0.0))
        return out

    def predict(self, inputs: jax.Array):
        variables = {"params": self.g_state.params}
        if self.g_state.batch_stats is not None:
            variables["batch_stats"] = self.g_state.batch_stats
        return self.gen.apply(variables, inputs, train=False)

    def _state_dict(self, epoch: int, best_loss: float) -> dict:
        return {
            "generator": {
                "params": self.g_state.params,
                "batch_stats": self.g_state.batch_stats or {},
                "opt_state": self.g_state.opt_state,
                "step": np.asarray(self.g_state.step),
            },
            "discriminator": {
                "params": self.d_state.params,
                "batch_stats": self.d_state.batch_stats or {},
                "opt_state": self.d_state.opt_state,
                "step": np.asarray(self.d_state.step),
            },
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
        try:
            r = restore_checkpoint(path, template)
        except Exception:
            # pre-step-field GAN checkpoints: restore without the step
            # entries, then resume with step 0 (the old behavior)
            for sub in ("generator", "discriminator"):
                template[sub] = {
                    k: v for k, v in template[sub].items() if k != "step"
                }
            r = restore_checkpoint(path, template)
            r["generator"]["step"] = np.asarray(0)
            r["discriminator"]["step"] = np.asarray(0)
        self.g_state = self.g_state.replace(
            params=r["generator"]["params"],
            batch_stats=r["generator"]["batch_stats"] or None,
            opt_state=r["generator"]["opt_state"],
            step=int(r["generator"]["step"]),
        )
        self.d_state = self.d_state.replace(
            params=r["discriminator"]["params"],
            batch_stats=r["discriminator"]["batch_stats"] or None,
            opt_state=r["discriminator"]["opt_state"],
            step=int(r["discriminator"]["step"]),
        )
        self.best_loss = float(r["best_loss"])
        self.start_epoch = int(r["epoch"]) + 1
