"""Jitted train/eval step factories — the compute hot loops.

Every step is one XLA program: forward + loss + backward + optimizer fused,
batch donated, batch sharded on the mesh's 'data' axis with the cross-chip
gradient psum inserted by GSPMD.  Mirrors the reference's per-batch loops
(SURVEY.md §3.2/§3.3) without the host round-trips (.item(), empty_cache).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mrisr_tpu.losses import lsgan_d_loss, lsgan_g_loss, l1 as l1_loss, mse
from mrisr_tpu.models.diffusion import DiffusionSchedule
from mrisr_tpu.train.state import TrainState


def _apply(state: TrainState, params, *args, train: bool, **kwargs):
    """Apply with/without BatchNorm mutation depending on the model."""
    if state.batch_stats is not None:
        variables = {"params": params, "batch_stats": state.batch_stats}
        if train:
            out, mutated = state.apply_fn(
                *( (variables,) + args), train=True, mutable=["batch_stats"],
                **kwargs,
            )
            return out, mutated["batch_stats"]
        return state.apply_fn(variables, *args, train=False, **kwargs), None
    variables = {"params": params}
    return state.apply_fn(variables, *args, **kwargs), None


# ---------------------------------------------------------------- supervised


def make_supervised_steps(
    loss_fn: Callable[[jax.Array, jax.Array], Tuple[jax.Array, Dict]],
    donate: bool = True,
    jit_steps: bool = True,
):
    """Steps for pair-input models (UNet / DeepCNN): batch (B, H, W, 3).

    ``jit_steps=False`` returns the raw (untraced) functions for embedding
    in a larger jitted program (train/device_epoch.py).
    """

    def train_step(state: TrainState, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]

        def loss_wrapped(params):
            pred, new_stats = _apply(state, params, inputs, train=True)
            loss, comps = loss_fn(pred, target)
            return loss, (comps, new_stats)

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, **comps}

    def eval_step(state: TrainState, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]
        pred, _ = _apply(state, state.params, inputs, train=False)
        loss, comps = loss_fn(pred, target)
        return {"loss": loss, **comps}

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


# --------------------------------------------------------------- progressive


def make_progressive_steps(
    loss_fn: Callable, donate: bool = True, jit_steps: bool = True
):
    """Steps for the 3-stage Progressive UNet: batch (B, H, W, 5)."""

    def train_step(state: TrainState, batch: jax.Array):
        def loss_wrapped(params):
            preds, new_stats = _apply(state, params, batch, train=True)
            loss, comps = loss_fn(preds, batch)
            return loss, (comps, new_stats)

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, **comps}

    def eval_step(state: TrainState, batch: jax.Array):
        preds, _ = _apply(state, state.params, batch, train=False)
        loss, comps = loss_fn(preds, batch)
        return {"loss": loss, **comps}

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


# ----------------------------------------------------------------- diffusion


def make_diffusion_steps(
    schedule: DiffusionSchedule, donate: bool = True, jit_steps: bool = True
):
    """Fast-DDPM ε-prediction steps (Fixed:cell11 semantics).

    Training draws ANTITHETIC timestep indices: ``t_idx`` uniform then
    mirrored ``T - t_idx - 1``; validation uses FIXED linspace timesteps for
    a stable loss ("FIX #1").  Grad clipping lives in the optax chain.
    """
    n_sel = schedule.num_inference_steps

    def train_step(state: TrainState, batch: jax.Array, key: jax.Array):
        pre, post, target = batch[..., 0:1], batch[..., 1:2], batch[..., 2:3]
        b = batch.shape[0]
        k_t, k_n = jax.random.split(key)
        # NOTE: b // 2 + 1 then truncate-to-b reproduces the reference
        # EXACTLY (Fixed:cell11) — for even b the last mirror is dropped,
        # so not every sample is antithetic-paired; (b + 1) // 2 would be
        # the "clean" pairing, but parity wins here.
        half = b // 2 + 1
        t_idx = jax.random.randint(k_t, (half,), 0, n_sel)
        t_idx = jnp.concatenate([t_idx, n_sel - t_idx - 1])[:b]
        t = schedule.timesteps[t_idx]
        noise = jax.random.normal(k_n, target.shape, jnp.float32)
        x_noisy = schedule.add_noise(target, t, noise)
        x_in = jnp.concatenate([pre, post, x_noisy], axis=-1)

        def loss_wrapped(params):
            eps = state.apply_fn({"params": params}, x_in, t)
            return mse(eps, noise)

        loss, grads = jax.value_and_grad(loss_wrapped)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    def eval_step(state: TrainState, batch: jax.Array, key: jax.Array):
        pre, post, target = batch[..., 0:1], batch[..., 1:2], batch[..., 2:3]
        b = batch.shape[0]
        # torch.linspace(0, n-1, B).long() -> truncation
        t_idx = jnp.floor(jnp.linspace(0.0, n_sel - 1, b)).astype(jnp.int32)
        t = schedule.timesteps[t_idx]
        noise = jax.random.normal(key, target.shape, jnp.float32)
        x_noisy = schedule.add_noise(target, t, noise)
        x_in = jnp.concatenate([pre, post, x_noisy], axis=-1)
        eps = state.apply_fn({"params": state.params}, x_in, t)
        return {"loss": mse(eps, noise)}

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


def make_simple_diffusion_steps(
    schedule, donate: bool = True, jit_steps: bool = True
):
    """ε-prediction steps for the M10 "simple" Fast-DDPM lineage.

    Parity with ``FastDDPM.forward`` (`/root/reference/src/ModelLoader.py:
    595-602`): timesteps are the COMPRESSED indices 0..T-1, noising uses the
    compressed ᾱ table (``FastNoiseSchedule.q_sample``), and the model input
    is ``[x_noisy, pre, post]`` — x FIRST, unlike the Fixed lineage.  The
    training notebook (FastDDPM_Simple.ipynb) is lost, so the t-sampling
    follows the house style of the surviving loop: antithetic uniform
    training draws, fixed linspace validation draws (Fixed:cell11).
    """
    n_sel = schedule.T

    def _x_in(batch, t, key):
        pre, post, target = batch[..., 0:1], batch[..., 1:2], batch[..., 2:3]
        noise = jax.random.normal(key, target.shape, jnp.float32)
        x_noisy = schedule.q_sample(target, t, noise)
        return jnp.concatenate([x_noisy, pre, post], axis=-1), noise

    def train_step(state: TrainState, batch: jax.Array, key: jax.Array):
        b = batch.shape[0]
        k_t, k_n = jax.random.split(key)
        half = b // 2 + 1
        t = jax.random.randint(k_t, (half,), 0, n_sel)
        t = jnp.concatenate([t, n_sel - t - 1])[:b]
        x_in, noise = _x_in(batch, t, k_n)

        def loss_wrapped(params):
            eps = state.apply_fn({"params": params}, x_in, t)
            return mse(eps, noise)

        loss, grads = jax.value_and_grad(loss_wrapped)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    def eval_step(state: TrainState, batch: jax.Array, key: jax.Array):
        b = batch.shape[0]
        t = jnp.floor(jnp.linspace(0.0, n_sel - 1, b)).astype(jnp.int32)
        x_in, noise = _x_in(batch, t, key)
        eps = state.apply_fn({"params": state.params}, x_in, t)
        return {"loss": mse(eps, noise)}

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


# ----------------------------------------------------------------------- GAN


def make_gan_steps(
    perceptual_fn: Optional[Callable] = None,
    lambda_l1: float = 1.0,
    lambda_perceptual: float = 0.1,
    lambda_adversarial: float = 0.01,
    donate: bool = True,
    jit_steps: bool = True,
):
    """LSGAN alternating updates, one fused step (T3 semantics:
    λ = 1.0 / 0.1 / 0.01, per-loss histories g/d/l1/perc/adv as in
    ``results/unet_gan_history.json``).

    The discriminator is conditional: D(concat(pre, post, candidate)).
    D updates on stop_gradient(fake); G updates with a fresh forward.

    BN note: the detached fake fed to D is produced with the generator's
    RUNNING statistics (eval-mode G forward); the G update itself runs
    train-mode.  The reference's (lost) loop likely kept G in train mode for
    both — a deliberate simplification here that avoids double-mutating G's
    stats per step; the G gradient path is unaffected.
    """

    def train_step(g_state: TrainState, d_state: TrainState, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]

        # ---- D update (fake detached)
        fake_detached, _ = _apply(g_state, g_state.params, inputs, train=False)
        fake_detached = jax.lax.stop_gradient(fake_detached)

        def d_loss_fn(d_params):
            d_real, d_stats = _apply(
                d_state, d_params,
                jnp.concatenate([inputs, target], axis=-1), train=True,
            )
            d_fake, d_stats2 = _apply(
                d_state.replace(batch_stats=d_stats), d_params,
                jnp.concatenate([inputs, fake_detached], axis=-1), train=True,
            )
            return lsgan_d_loss(d_real, d_fake), d_stats2

        (d_loss, d_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)
        if d_stats is not None:
            d_state = d_state.replace(batch_stats=d_stats)

        # ---- G update
        def g_loss_fn(g_params):
            fake, g_stats = _apply(g_state, g_params, inputs, train=True)
            d_fake, _ = _apply(
                d_state, d_state.params,
                jnp.concatenate([inputs, fake], axis=-1), train=False,
            )
            adv = lsgan_g_loss(d_fake)
            rec = l1_loss(fake, target)
            total = lambda_l1 * rec + lambda_adversarial * adv
            comps = {"l1": rec, "adv": adv}
            if perceptual_fn is not None:
                perc = perceptual_fn(fake, target)
                total = total + lambda_perceptual * perc
                comps["perc"] = perc
            return total, (comps, g_stats)

        (g_loss, (g_comps, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        if g_stats is not None:
            g_state = g_state.replace(batch_stats=g_stats)

        metrics = {"g": g_loss, "d": d_loss, **g_comps}
        return g_state, d_state, metrics

    def eval_step(g_state: TrainState, d_state: TrainState, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]
        fake, _ = _apply(g_state, g_state.params, inputs, train=False)
        d_real, _ = _apply(
            d_state, d_state.params,
            jnp.concatenate([inputs, target], axis=-1), train=False,
        )
        d_fake, _ = _apply(
            d_state, d_state.params,
            jnp.concatenate([inputs, fake], axis=-1), train=False,
        )
        adv = lsgan_g_loss(d_fake)
        rec = l1_loss(fake, target)
        comps = {
            "l1_loss": rec,
            "adv_loss": adv,
            "d_loss": lsgan_d_loss(d_real, d_fake),
        }
        total = lambda_l1 * rec + lambda_adversarial * adv
        if perceptual_fn is not None:
            perc = perceptual_fn(fake, target)
            comps["perc_loss"] = perc
            total = total + lambda_perceptual * perc
        comps["g_loss"] = total
        return comps

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0, 1) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )
