"""Trainers: epoch loops with early stopping + checkpoint + history.

``SupervisedTrainer`` reproduces UNetTrainer's contract (T1,
`/root/reference/src/unet_model.py:148-298`): per-epoch train/val MSE,
early stopping with a patience counter, ``<name>_best`` / ``<name>_latest``
checkpoints, history JSON + loss-curve PNG.  It also covers the combined
loss (T2) and the progressive weighted loss (T4) through the loss config.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.config import Config
from mrisr_tpu.losses import combined_loss, mse, progressive_loss
from mrisr_tpu.models.registry import init_model
from mrisr_tpu.train.history import TrainingHistory
from mrisr_tpu.train.state import TrainState, create_train_state, make_optimizer
from mrisr_tpu.train.steps import make_progressive_steps, make_supervised_steps


def _mean_metrics(acc: Dict[str, float], n: int) -> Dict[str, float]:
    return {k: v / max(n, 1) for k, v in acc.items()}


class _EpochLoopMixin:
    """Shared epoch loop: early stopping, best/latest ckpt, history."""

    config: Config
    history: TrainingHistory

    def _augment_spec(self):
        from mrisr_tpu.data.pipeline import _AugmentSpec

        d = self.config.data
        return _AugmentSpec(
            enabled=d.augment,
            hflip=d.hflip,
            vflip=d.vflip,
            rot90=d.rot90,
            rotate_degrees=d.rotate_degrees,
        )

    def enable_device_epochs(self, bank, plan_flat, augment=None,
                             **runner_kwargs) -> None:
        """Switch TRAIN epochs to the device-resident lax.scan runner
        (train/device_epoch.py): bank must be a device-backend SliceBank
        and ``plan_flat`` the loader's (N, 3) pair / (N, 5) window flat
        slice plan.  Validation still uses the regular loader path.
        Subclasses pass their step-signature flags via ``runner_kwargs``
        (GAN: multi_state=True; diffusion: step_takes_key=True).  When the
        trainer was built with a mesh, the runner shards each batch across
        the mesh's 'data' axis (data-parallel scan epochs)."""
        from mrisr_tpu.train.device_epoch import DeviceEpochRunner

        self._device_runner = DeviceEpochRunner(
            bank, plan_flat, self._raw_train_step,
            batch_size=self.config.data.batch_size,
            augment=augment or self._augment_spec(),
            mesh=getattr(self, "mesh", None),
            **runner_kwargs,
        )

    def _ckpt_path(self, suffix: str) -> str:
        d = self.config.train.checkpoint_dir
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{self.config.preset}_{suffix}")

    def try_resume(self) -> bool:
        """Resume from the newest ``<preset>_epoch_N`` checkpoint, falling
        back to ``<preset>_latest`` (T7 auto-resume semantics, extended to
        every trainer)."""
        from mrisr_tpu.ckpt import get_latest_checkpoint

        found = get_latest_checkpoint(
            self.config.train.checkpoint_dir, self.config.preset
        )
        path = found[0] if found is not None else None
        if path is None:
            latest = self._ckpt_path("latest")
            if os.path.isdir(latest):
                path = latest
        if path is None:
            return False
        self.load(path)
        self._restore_history()
        return True

    def _restore_history(self) -> None:
        """Reload prior epoch series from the run's history JSON so resumed
        runs keep a continuous history (the reference stored history inside
        its checkpoints, T7; here the results JSON is the source)."""
        hist_path = os.path.join(
            self.config.train.results_dir, f"{self.config.preset}_history.json"
        )
        if not os.path.exists(hist_path):
            return
        try:
            with open(hist_path) as f:
                prior = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        cutoff = getattr(self, "start_epoch", 1) - 1
        epochs = prior.get("epoch", [])
        keep = sum(1 for e in epochs if e <= cutoff)
        for k, v in prior.items():
            if isinstance(v, list) and v and isinstance(v[0], (int, float)):
                self.history.series[k] = [float(x) for x in v[:keep]]

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        epochs: Optional[int] = None,
        verbose: bool = True,
    ) -> TrainingHistory:
        epochs = epochs or self.config.train.epochs
        patience = self.config.train.early_stopping_patience
        best_loss = getattr(self, "best_loss", float("inf"))
        patience_counter = 0
        start_epoch = getattr(self, "start_epoch", 1)

        import time

        for epoch in range(start_epoch, epochs + 1):
            t_epoch = time.perf_counter()
            train_metrics = self.run_epoch(train_loader, train=True, epoch=epoch)
            if val_loader is not None:
                val_metrics = self.run_epoch(val_loader, train=False, epoch=epoch)
            else:
                val_metrics = train_metrics
            self.history.append(
                epoch=epoch,
                train_loss=train_metrics["loss"],
                val_loss=val_metrics["loss"],
                # wall-clock per epoch (the v3 notebook's epoch_times series)
                epoch_time_s=time.perf_counter() - t_epoch,
            )
            for k, v in train_metrics.items():
                if k != "loss":
                    self.history.append(**{f"train_{k}": v})
            if val_loader is not None:
                for k, v in val_metrics.items():
                    if k != "loss":
                        self.history.append(**{f"val_{k}": v})
            if verbose:
                print(
                    f"Epoch {epoch}/{epochs} | train {train_metrics['loss']:.4f}"
                    f" | val {val_metrics['loss']:.4f}",
                    end="",
                )
            improved = val_metrics["loss"] < best_loss
            if improved:
                best_loss = val_metrics["loss"]
                patience_counter = 0
                # light mode: best goes through the async writer (flushed
                # before fit() returns) so improvement epochs don't stall
                self.save(self._ckpt_path("best"), epoch, best_loss,
                          async_=self.config.train.light_checkpoints)
                if verbose:
                    print("  (best)")
            else:
                patience_counter += 1
                if verbose:
                    print(f"  (patience {patience_counter}/{patience})")
            if not self.config.train.light_checkpoints:
                self.save(self._ckpt_path("latest"), epoch, best_loss)
            if self.config.train.save_every_epoch:
                # per-epoch resume snapshots go through the async writer so
                # the step loop never waits on IO (flushed at exit / next save)
                self.save(
                    self._ckpt_path(f"epoch_{epoch}"), epoch, best_loss,
                    async_=True,
                )
            if patience and patience_counter >= patience:
                if verbose:
                    print(f"Early stopping after {epoch} epochs")
                break

        if self.config.train.light_checkpoints:
            # the one resumable state light mode keeps
            self.save(self._ckpt_path("latest"), epoch, best_loss)
        # flush in-flight async per-epoch saves so a resume immediately
        # after fit() sees the newest epoch checkpoint
        from mrisr_tpu.ckpt import wait_for_async_saves

        wait_for_async_saves()

        self.best_loss = best_loss
        self.history.set(best_val_loss=best_loss)
        rd = self.config.train.results_dir
        os.makedirs(rd, exist_ok=True)
        self.history.save_json(
            os.path.join(rd, f"{self.config.preset}_history.json")
        )
        self.history.save_curves_png(
            os.path.join(rd, f"{self.config.preset}_training_curves.png"),
            title=f"{self.config.preset} training",
        )
        return self.history


class SupervisedTrainer(_EpochLoopMixin):
    """MSE / combined / progressive training for the deterministic models."""

    def __init__(
        self,
        config: Config,
        perceptual_fn: Optional[Callable] = None,
        image_size=(256, 256),
        mesh=None,
        steps_per_epoch: Optional[int] = None,
    ):
        self.config = config
        self.mesh = mesh
        name = config.model.name
        dtype = (
            jnp.bfloat16 if config.train.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.model, variables, self.kind = init_model(
            name, config.model, dtype=dtype, image_size=image_size,
            seed=config.train.seed,
        )
        # steps_per_epoch is only needed by step-indexed LR schedules
        # (lr_schedule='cosine'); constant-LR presets may omit it
        tx = make_optimizer(config.train, steps_per_epoch=steps_per_epoch)
        self.state = create_train_state(self.model, variables, tx)
        if mesh is not None:
            from mrisr_tpu.parallel.mesh import replicated

            self.state = jax.device_put(self.state, replicated(mesh))

        loss_kind = config.loss.kind
        if self.kind == "window":
            loss_fn = lambda preds, window: progressive_loss(  # noqa: E731
                preds, window,
                config.loss.w_i1, config.loss.w_i2, config.loss.w_i3,
            )
            self.train_step, self.eval_step = make_progressive_steps(
                loss_fn, donate=config.train.donate_batch
            )
            self._raw_train_step, _ = make_progressive_steps(
                loss_fn, jit_steps=False
            )
        else:
            if loss_kind == "combined":
                loss_fn = lambda pred, target: combined_loss(  # noqa: E731
                    pred, target,
                    perceptual_fn=perceptual_fn,
                    lambda_perceptual=config.loss.lambda_perceptual,
                    lambda_ssim=config.loss.lambda_ssim,
                )
            else:  # plain MSE (T1)
                loss_fn = lambda pred, target: (mse(pred, target), {})  # noqa: E731
            self.train_step, self.eval_step = make_supervised_steps(
                loss_fn, donate=config.train.donate_batch
            )
            self._raw_train_step, _ = make_supervised_steps(
                loss_fn, jit_steps=False
            )
        self._device_runner = None
        self.history = TrainingHistory(json.loads(config.to_json()))

    def run_epoch(self, loader, train: bool, epoch: int) -> Dict[str, float]:
        if train and self._device_runner is not None:
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.config.train.seed), epoch
            )
            self.state, metrics = self._device_runner.run_epoch(self.state, key)
            return {k: float(v) for k, v in metrics.items()}
        acc: Dict[str, float] = {}
        n = 0
        for batch in loader:
            if train:
                self.state, metrics = self.train_step(self.state, batch)
            else:
                metrics = self.eval_step(self.state, batch)
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        return _mean_metrics(acc, n)

    # ------------------------------------------------------------- predict
    def predict(self, inputs: jax.Array):
        """inputs: (B, H, W, 2) pair or (B, H, W, 5) window -> prediction(s)."""
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        return self.model.apply(variables, inputs, train=False)

    # ---------------------------------------------------------------- ckpt
    def _state_dict(self, epoch: int, best_loss: float) -> dict:
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats or {},
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
        restored = restore_checkpoint(path, template)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"] or None,
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        self.best_loss = float(restored["best_loss"])
        self.start_epoch = int(restored["epoch"]) + 1
