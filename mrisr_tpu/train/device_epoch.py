"""Device-resident epoch training: the whole epoch inside ONE jit.

The reference's training loop crosses the host on EVERY batch — DataLoader
worker pickling, H2D copy, ``loss.item()``, even ``torch.cuda.empty_cache()``
(SURVEY.md §3.2/§3.3).  On TPU every such crossing costs a dispatch
round-trip.  This runner removes the host entirely:

- the split's normalized slices live flat in HBM (``SliceBank``
  backend='device', bf16),
- the epoch's sample plan is an int32 array in HBM,
- one ``lax.scan`` per epoch: on-device shuffle (``jax.random.permutation``)
  -> gather -> paired augmentation -> fused train step, state donated
  through the scan carry,
- the host sees one small metrics dict per epoch.

Covers ALL four training regimes (r1 verdict item 3):
- pair models     step(state, batch)            batch (B, H, W, 3)
- window models   step(state, batch)            batch (B, H, W, 5)
- diffusion       step(state, batch, key)       noise/timestep draws
- GAN             step(g_state, d_state, batch) two TrainStates in the carry

For real-data scale (641 train volumes, 60x256² slices) the bank is
~4.7 GB bf16 — comfortably HBM-resident on a 16 GB v5e chip next to the
largest (93 M-param) model + Adam state.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.data.pipeline import SliceBank, _AugmentSpec
from mrisr_tpu.ops.augment import paired_augment


def _normalize_step(train_step: Callable, step_takes_key: bool,
                    multi_state: bool) -> Callable:
    """Wrap the trainer's raw step into (carry, batch, key) -> (carry, metrics).

    multi_state: carry is a TUPLE of TrainStates and the raw step has
    signature ``(*states, batch) -> (*states, metrics)`` (the GAN's
    ``make_gan_steps`` shape).
    """
    if multi_state:
        def step(carry, batch, key):
            out = train_step(*carry, batch)
            return tuple(out[:-1]), out[-1]
    elif step_takes_key:
        def step(carry, batch, key):
            return train_step(carry, batch, key)
    else:
        def step(carry, batch, key):
            return train_step(carry, batch)
    return step


class DeviceEpochRunner:
    """Runs training epochs fully on device for any trainer kind.

    bank: SliceBank with backend='device'.
    plan_flat: (N, C) int32 flat slice ids (TripletLoader/WindowLoader
    ``plan_flat``; C=3 for triplets, 5 for windows).
    train_step: RAW (unjitted) step fn from make_*_steps(..., jit_steps=False).
    step_takes_key: step signature (state, batch, key) — diffusion.
    multi_state: step signature (*states, batch) -> (*states, metrics) and
    the carry passed to :meth:`run_epoch` is a tuple of TrainStates — GAN.
    mesh: a ('data', 'model') Mesh for data-parallel epochs (SURVEY.md §2.5
    DP row).  The slice bank and plan are replicated across the mesh and the
    gathered batch is sharding-constrained onto the 'data' axis inside the
    scan body, so each chip gathers + steps only its batch shard; with the
    carry (params/opt state) replicated, GSPMD emits the gradient psum over
    ICI automatically.  ``mesh=None`` is the unchanged single-device path.
    """

    def __init__(
        self,
        bank: SliceBank,
        plan_flat: np.ndarray,
        train_step: Callable,
        batch_size: int,
        augment: Optional[_AugmentSpec] = None,
        step_takes_key: bool = False,
        multi_state: bool = False,
        mesh=None,
    ):
        assert bank.backend == "device", "DeviceEpochRunner needs a device bank"
        self.mesh = mesh
        batch_spec = None
        if mesh is not None:
            from mrisr_tpu.parallel.mesh import batch_sharding, replicated

            n_data = mesh.shape["data"]
            assert batch_size % n_data == 0, (
                f"batch_size {batch_size} not divisible by the mesh's "
                f"data axis ({n_data})"
            )
            self.flat = jax.device_put(bank.flat, replicated(mesh))
            self.plan = jax.device_put(
                jnp.asarray(plan_flat, jnp.int32), replicated(mesh)
            )
            batch_spec = batch_sharding(mesh)
        else:
            self.flat = bank.flat  # (S, H, W) device array
            self.plan = jax.device_put(jnp.asarray(plan_flat, jnp.int32))
        self.batch_size = batch_size
        self.steps_per_epoch = plan_flat.shape[0] // batch_size
        assert self.steps_per_epoch > 0, (
            f"batch_size {batch_size} exceeds the {plan_flat.shape[0]} "
            "samples available — a zero-step scan would return NaN loss"
        )
        self.augment = augment or _AugmentSpec()
        aug = self.augment
        n = int(plan_flat.shape[0])
        steps = self.steps_per_epoch
        bs = batch_size
        step_fn = _normalize_step(train_step, step_takes_key, multi_state)

        def epoch_fn(carry, flat, plan, key):
            k_perm, k_aug, k_step = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n)

            def body(carry, step):
                idx = jax.lax.dynamic_slice_in_dim(perm, step * bs, bs)
                rows = plan[idx]                      # (B, C)
                stack = flat[rows]                    # (B, C, H, W)
                batch = jnp.moveaxis(stack, 1, -1).astype(jnp.float32)
                if batch_spec is not None:
                    # pin the batch to the 'data' axis; GSPMD back-propagates
                    # the sharding through the gather so each chip reads only
                    # its rows, and forward through the step compute
                    batch = jax.lax.with_sharding_constraint(batch, batch_spec)
                if aug.enabled:
                    batch = paired_augment(
                        jax.random.fold_in(k_aug, step), batch,
                        hflip=aug.hflip, vflip=aug.vflip, rot90=aug.rot90,
                        rotate_degrees=aug.rotate_degrees,
                    )
                carry, metrics = step_fn(
                    carry, batch, jax.random.fold_in(k_step, step)
                )
                return carry, metrics

            carry, metrics = jax.lax.scan(
                body, carry, jnp.arange(steps, dtype=jnp.int32)
            )
            # per-step metric dicts stacked by scan -> epoch means
            return carry, jax.tree.map(jnp.mean, metrics)

        self._epoch = jax.jit(epoch_fn, donate_argnums=(0,))

    def run_epoch(self, carry, key: jax.Array) -> Tuple[object, Dict]:
        """One full epoch; returns (new_carry, mean_metrics_dict).

        carry: a TrainState, or a tuple of TrainStates when the runner was
        built with ``multi_state=True``.
        """
        return self._epoch(carry, self.flat, self.plan, key)
