"""Fast-DDPM: conditional diffusion for slice interpolation.

Covers the reference's diffusion stack (SURVEY.md M10-M12, T5-T6):

- :class:`FastDDPMUNet` — the *trained* lineage
  (`/root/reference/notebooks/FastDDPM_Training_Fixed.ipynb:cell7`):
  time-conditioned ResBlock UNet, in 3ch = [pre, post, x_noisy],
  13,899,905 params at base 64 (verified by test), 55.6 M at base 128.
- :class:`SimpleDiffusionUNet` — the checkpoint-compatible "Simple" model
  (`/root/reference/src/ModelLoader.py:536-584`): 2-level UNet that
  broadcasts a 256-dim time embedding as extra input channels.
- :class:`DiffusionSchedule` — notebook DDPMScheduler (`Fixed:cell5`):
  1000-step linear/cosine β, inference-step selection uniform /
  non-uniform-40-60 / exact paper 10-step / linspace.
- :class:`FastNoiseSchedule` — ModelLoader FastNoiseScheduler (`:486-513`):
  the compressed-T variant where the β tables are subsampled to T entries
  and the model sees compressed indices 0..T-1.
- :func:`sample_ancestral` — the "Fixed" notebook sampler (`Fixed:cell13`)
  incl. its FIX#2 semantics (ᾱ used consistently in the posterior mean);
  :func:`sample_ddim` — ModelLoader's deterministic sampler (`:604-636`).

TPU design: both samplers are single ``lax.scan`` loops over precomputed
per-step constants — 10 sequential UNet calls fully inside one jit, batch
sharded over the data mesh axis (SURVEY.md §3.4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrisr_tpu.models.blocks import UpConv2x2, max_pool_2x2

# --------------------------------------------------------------------------
# timestep embeddings
# --------------------------------------------------------------------------


def timestep_embedding(t: jax.Array, dim: int, variant: str = "ddpm") -> jax.Array:
    """Sinusoidal timestep embedding, (B,) -> (B, dim), float32.

    variant='ddpm':   freq = exp(-log(1e4) * i / (half - 1))  — notebook
                      ``get_timestep_embedding`` (Fixed:cell7); zero-pads if odd.
    variant='simple': freq = exp(-log(1e4) * i / half)        — ModelLoader
                      ``sinusoidal_timestep_embedding`` (`:471-483`).
    """
    half = dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    if variant == "ddpm":
        freqs = jnp.exp(-math.log(10000.0) * i / (half - 1))
    elif variant == "simple":
        freqs = jnp.exp(-math.log(10000.0) * i / half)
    else:
        raise ValueError(variant)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeEmbedding(nn.Module):
    """sinusoidal -> Linear(d, 2d) -> SiLU -> Linear(2d, d)  (Fixed:cell7)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = timestep_embedding(t, self.dim, "ddpm")
        emb = nn.Dense(self.dim * 2, dtype=self.dtype)(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype)(emb)


# --------------------------------------------------------------------------
# the trained FastDDPM UNet (notebook "Fixed" lineage)
# --------------------------------------------------------------------------


class DiffResBlock(nn.Module):
    """GroupNorm/SiLU residual block with additive time projection.

    GroupNorm groups = max(1, channels // 4), matching ``ResBlock``
    (Fixed:cell7).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(
            num_groups=max(1, in_ch // 4), epsilon=1e-5, dtype=self.dtype,
            name="norm1",
        )(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = h + nn.Dense(self.features, dtype=self.dtype, name="time_fc")(
            t_emb
        )[:, None, None, :]
        h = nn.GroupNorm(
            num_groups=max(1, self.features // 4), epsilon=1e-5,
            dtype=self.dtype, name="norm2",
        )(h)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(x)
        return h + x


class FastDDPMUNet(nn.Module):
    """(B, H, W, 3) + (B,) t -> (B, H, W, 1) noise prediction."""

    out_channels: int = 1
    base_features: int = 64
    time_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        b = self.base_features
        t_emb = TimeEmbedding(self.time_dim, dtype=self.dtype, name="time_emb")(t)

        h = nn.Conv(b, (3, 3), padding=1, dtype=self.dtype, name="init_conv")(x)

        e1 = DiffResBlock(b * 2, dtype=self.dtype, name="enc1")(h, t_emb)
        h = max_pool_2x2(e1)
        e2 = DiffResBlock(b * 4, dtype=self.dtype, name="enc2")(h, t_emb)
        h = max_pool_2x2(e2)
        e3 = DiffResBlock(b * 8, dtype=self.dtype, name="enc3")(h, t_emb)
        h = max_pool_2x2(e3)

        h = DiffResBlock(b * 8, dtype=self.dtype, name="bottleneck")(h, t_emb)

        h = UpConv2x2(b * 4, dtype=self.dtype, name="upconv3")(h)
        h = jnp.concatenate([h, e3], axis=-1)
        h = DiffResBlock(b * 4, dtype=self.dtype, name="dec3")(h, t_emb)

        h = UpConv2x2(b * 2, dtype=self.dtype, name="upconv2")(h)
        h = jnp.concatenate([h, e2], axis=-1)
        h = DiffResBlock(b * 2, dtype=self.dtype, name="dec2")(h, t_emb)

        h = UpConv2x2(b, dtype=self.dtype, name="upconv1")(h)
        h = jnp.concatenate([h, e1], axis=-1)
        h = DiffResBlock(b, dtype=self.dtype, name="dec1")(h, t_emb)

        h = nn.GroupNorm(
            num_groups=max(1, b // 4), epsilon=1e-5, dtype=self.dtype,
            name="final_norm",
        )(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="final_conv")(h)
        return h.astype(jnp.float32)


# --------------------------------------------------------------------------
# the "Simple" checkpoint-compatible UNet2D (ModelLoader M10)
# --------------------------------------------------------------------------


class SimpleDiffusionUNet(nn.Module):
    """2-level UNet; time embedding broadcast + concatenated as channels
    (`/root/reference/src/ModelLoader.py:536-584`).  Nearest 2x upsampling
    matches torch ``F.interpolate(scale_factor=2)`` defaults."""

    base_features: int = 64
    time_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        b = self.base_features

        def double_conv(feat, name):
            def f(h):
                h = nn.Conv(feat, (3, 3), padding=1, dtype=self.dtype,
                            name=f"{name}_conv1")(h)
                h = nn.relu(h)
                h = nn.Conv(feat, (3, 3), padding=1, dtype=self.dtype,
                            name=f"{name}_conv2")(h)
                return nn.relu(h)

            return f

        t_emb = timestep_embedding(t, self.time_dim, "simple")
        t_emb = nn.Dense(self.time_dim, dtype=self.dtype, name="time_mlp1")(t_emb)
        t_emb = nn.relu(t_emb)
        t_emb = nn.Dense(self.time_dim, dtype=self.dtype, name="time_mlp2")(t_emb)
        t_map = jnp.broadcast_to(
            t_emb[:, None, None, :],
            (x.shape[0], x.shape[1], x.shape[2], self.time_dim),
        )
        x = jnp.concatenate([x, t_map], axis=-1)

        c1 = double_conv(b, "inc")(x)
        c2 = double_conv(b * 2, "down1")(max_pool_2x2(c1))
        c3 = double_conv(b * 4, "down2")(max_pool_2x2(c2))

        u2 = _upsample_nearest_2x(c3)
        u2 = double_conv(b * 2, "up2")(jnp.concatenate([u2, c2], axis=-1))
        u1 = _upsample_nearest_2x(u2)
        u1 = double_conv(b, "up1")(jnp.concatenate([u1, c1], axis=-1))
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="outc")(u1)
        return out.astype(jnp.float32)


def _upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


# --------------------------------------------------------------------------
# schedules
# --------------------------------------------------------------------------


def _beta_table(num_timesteps: int, beta_schedule: str) -> np.ndarray:
    if beta_schedule == "cosine":
        s = 0.008
        steps = np.arange(num_timesteps + 1, dtype=np.float64)
        abar = np.cos(((steps / num_timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        abar = abar / abar[0]
        betas = 1.0 - (abar[1:] / abar[:-1])
        return np.clip(betas, 0.0001, 0.9999)
    elif beta_schedule == "linear":
        return np.linspace(0.0001, 0.02, num_timesteps)
    raise ValueError(beta_schedule)


def _select_timesteps(
    num_timesteps: int, num_inference_steps: int, selection: str
) -> np.ndarray:
    """Inference timestep selection strategies (ascending order).

    'uniform'          — every skip-th step (Fixed:cell5 'uniform').
    'nonuniform-4060'  — 40 % over [0, 699], 60 % over [699, 999], ceil-based
                         (Fixed:cell5 'non-uniform', the trained config).
    'linspace'         — even coverage (the reference's 50-step branch).
    'paper10'          — the exact Fast-DDPM paper 10-step sequence
                         (FastDDPM_Training_v2.ipynb:cell5).
    """
    t, s = num_timesteps, num_inference_steps
    if selection == "uniform":
        skip = t // s
        return np.arange(0, t, skip, dtype=np.int64)[:s]
    if selection == "linspace":
        return np.linspace(0, t - 1, s).astype(np.int64)
    if selection == "paper10":
        assert t == 1000 and s == 10
        return np.array([0, 199, 399, 599, 699, 799, 849, 899, 949, 999])
    if selection == "nonuniform-4060":
        n1 = int(s * 0.4)
        n2 = int(s * 0.6)
        stage1 = (
            np.ceil(np.linspace(0, 699, n1 + 1)[:-1]).astype(np.int64)
            if n1 > 0
            else np.zeros(0, np.int64)
        )
        stage2 = np.ceil(np.linspace(699, t - 1, n2 + 1)[:-1]).astype(np.int64)
        return np.concatenate([stage1, stage2])
    raise ValueError(selection)


@dataclass(frozen=True)
class DiffusionSchedule:
    """Full-table schedule; model sees ORIGINAL timestep values 0..T-1."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    timesteps: jnp.ndarray  # (num_inference_steps,) ascending original values

    @staticmethod
    def create(
        num_timesteps: int = 1000,
        num_inference_steps: int = 10,
        beta_schedule: str = "linear",
        selection: str = "nonuniform-4060",
    ) -> "DiffusionSchedule":
        betas = _beta_table(num_timesteps, beta_schedule)
        alphas = 1.0 - betas
        abar = np.cumprod(alphas)
        ts = _select_timesteps(num_timesteps, num_inference_steps, selection)
        return DiffusionSchedule(
            betas=jnp.asarray(betas, jnp.float32),
            alphas=jnp.asarray(alphas, jnp.float32),
            alphas_cumprod=jnp.asarray(abar, jnp.float32),
            timesteps=jnp.asarray(ts, jnp.int32),
        )

    @property
    def num_inference_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def add_noise(self, x0, t, noise):
        """q(x_t | x_0): sqrt(ᾱ_t) x0 + sqrt(1 - ᾱ_t) ε  (Fixed:cell5)."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(abar).reshape(shape) * x0
            + jnp.sqrt(1.0 - abar).reshape(shape) * noise
        )


@dataclass(frozen=True)
class FastNoiseSchedule:
    """Compressed-T schedule (ModelLoader FastNoiseScheduler, `:486-513`).

    The 1000-step linear β table is subsampled to T indices (40 % over
    [0, 699], 60 % over [699, 999], torch ``linspace(...).long()`` i.e.
    truncation); the model is conditioned on compressed indices 0..T-1.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray

    @staticmethod
    def create(T: int = 10) -> "FastNoiseSchedule":
        betas = np.linspace(1e-4, 0.02, 1000)
        alphas = 1.0 - betas
        abar = np.cumprod(alphas)
        late = int(T * 0.6)
        early = T - late
        idx_early = np.linspace(0, 699, early).astype(np.int64)
        idx_late = np.linspace(699, 999, late).astype(np.int64)
        idxs = np.sort(np.concatenate([idx_early, idx_late]))
        return FastNoiseSchedule(
            betas=jnp.asarray(betas[idxs], jnp.float32),
            alphas=jnp.asarray(alphas[idxs], jnp.float32),
            alphas_cumprod=jnp.asarray(abar[idxs], jnp.float32),
        )

    @property
    def T(self) -> int:
        return int(self.betas.shape[0])

    def q_sample(self, x0, t, noise):
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(abar).reshape(shape) * x0
            + jnp.sqrt(1.0 - abar).reshape(shape) * noise
        )


# --------------------------------------------------------------------------
# samplers (lax.scan denoising loops)
# --------------------------------------------------------------------------


def sample_ancestral(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    cond: jax.Array,
    key: jax.Array,
    schedule: DiffusionSchedule,
    num_samples: int = 3,
    combine: str = "first",
) -> jax.Array:
    """Ancestral sampler matching the Fixed notebook (`Fixed:cell13`).

    eps_fn(x_input (B,H,W,3), t (B,) int32) -> (B,H,W,1);
    cond: (B, H, W, 2) = [pre, post].  Returns (B, H, W, 1).

    FIX#2 semantics preserved: the posterior mean uses ᾱ_t where vanilla DDPM
    uses α_t; posterior variance uses β_t = 1 - α_t, clamped at 1e-20.

    combine='first' returns the first of ``num_samples`` independent draws —
    statistically identical to drawing once, so only one is computed.
    'mean' averages ``num_samples`` draws (the v2 notebook variant,
    `FastDDPM_Training_v2.ipynb:cell29`); 'last' mirrors 'first'.
    """
    b, h, w, _ = cond.shape
    ts = schedule.timesteps  # ascending
    n_steps = schedule.num_inference_steps

    # per-step constants, in REVERSE iteration order (step_idx descending)
    order = jnp.arange(n_steps - 1, -1, -1)
    t_vals = ts[order]
    abar_t = schedule.alphas_cumprod[t_vals]
    prev_idx = jnp.clip(order - 1, 0, n_steps - 1)
    abar_prev = jnp.where(
        order > 0, schedule.alphas_cumprod[ts[prev_idx]], 1.0
    )
    beta_t = 1.0 - schedule.alphas[t_vals]
    post_var = jnp.maximum((1.0 - abar_prev) / (1.0 - abar_t) * beta_t, 1e-20)
    is_not_last = (order > 0).astype(jnp.float32)

    consts = (t_vals, abar_t, post_var, is_not_last)

    def one_chain(chain_key):
        k_init, k_loop = jax.random.split(chain_key)
        x0 = jax.random.normal(k_init, (b, h, w, 1), jnp.float32)

        def step(carry, per_step):
            x = carry
            t_val, abar, pvar, notlast = per_step
            t_batch = jnp.full((b,), t_val, jnp.int32)
            eps = eps_fn(jnp.concatenate([cond, x], axis=-1), t_batch)
            x = (1.0 / jnp.sqrt(abar)) * (
                x - (1.0 - abar) / jnp.sqrt(1.0 - abar) * eps
            )
            zkey = jax.random.fold_in(k_loop, t_val)
            z = jax.random.normal(zkey, x.shape, jnp.float32)
            x = x + notlast * jnp.sqrt(pvar) * z
            return x, None

        x_final, _ = jax.lax.scan(step, x0, consts)
        return x_final

    if combine in ("first", "last"):
        return one_chain(jax.random.fold_in(key, 0))
    elif combine == "mean":
        keys = jax.random.split(key, num_samples)
        chains = jax.vmap(one_chain)(keys)  # (S, B, H, W, 1)
        return jnp.mean(chains, axis=0)
    raise ValueError(combine)


def sample_ddim(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    cond: jax.Array,
    key: jax.Array,
    schedule: FastNoiseSchedule,
) -> jax.Array:
    """Deterministic DDIM-style sampler over the compressed schedule
    (`/root/reference/src/ModelLoader.py:604-636`).  Note the reference
    concatenates [x, cond] (x FIRST) for this model.  Final clamp to [-1, 1].
    """
    b, h, w, _ = cond.shape
    T = schedule.T
    order = jnp.arange(T - 1, -1, -1)
    abar_t = schedule.alphas_cumprod[order]
    abar_prev = jnp.where(
        order > 0, schedule.alphas_cumprod[jnp.maximum(order - 1, 0)], 1.0
    )
    x0_init = jax.random.normal(key, (b, h, w, 1), jnp.float32)

    def step(x, per_step):
        i, abar, abprev = per_step
        t_batch = jnp.full((b,), i, jnp.int32)
        eps = eps_fn(jnp.concatenate([x, cond], axis=-1), t_batch)
        x0 = (x - jnp.sqrt(1.0 - abar) * eps) / jnp.sqrt(abar)
        x = jnp.sqrt(abprev) * x0 + jnp.sqrt(1.0 - abprev) * eps
        return x, None

    x, _ = jax.lax.scan(step, x0_init, (order, abar_t, abar_prev))
    return jnp.clip(x, -1.0, 1.0)
