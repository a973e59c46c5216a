"""Train state + optimizer construction.

Optimizer choices mirror the reference configs: Adam (UNet family,
`/root/reference/src/unet_model.py:155`), AdamW + global-norm grad clip 1.0
(diffusion, `notebooks/FastDDPM_Training_Fixed.ipynb:cell9,cell11`), optional
cosine LR decay (the v2 notebook variant).
"""

from __future__ import annotations

from typing import Any, Optional

import optax
from flax.training import train_state

from mrisr_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running statistics.

    ``ema_params`` (optional, default None) is an exponential moving average
    of ``params`` maintained by steps that opt in (serve/distill.py's
    ``ema_decay``); it rides the same pytree, so the device-resident
    lax.scan epoch runner and mesh replication carry it with no extra code.
    """

    batch_stats: Any = None
    ema_params: Any = None


def make_optimizer(
    cfg: TrainConfig,
    learning_rate: Optional[float] = None,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        if steps_per_epoch:
            lr = optax.cosine_decay_schedule(lr, cfg.epochs * steps_per_epoch)
        else:
            import warnings

            warnings.warn(
                "lr_schedule='cosine' requires steps_per_epoch; "
                "falling back to a constant learning rate",
                stacklevel=2,
            )
    if cfg.optimizer == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        tx = optax.adam(lr)
    else:
        raise ValueError(cfg.optimizer)
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(
    model, variables, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
