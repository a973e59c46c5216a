"""VGG16 perceptual feature distance on TPU.

The reference's perceptual loss implementation was lost with its notebooks;
``results/unet_gan_history.json`` proves one existed (per-epoch ``perc``
histories, λ_perceptual = 0.1) and the README names "VGG perceptual loss"
(README.md:82-85).  Rebuild decisions (documented per SURVEY.md §7):

- Feature extractor: VGG16 conv stack through relu3_3 (the common perceptual
  choice), implemented in Flax NHWC.
- 1-channel z-scored inputs are replicated to 3 channels; no ImageNet
  mean/std re-normalization (inputs are already standardized).
- Pretrained weights load from an ``.npz`` (``MRISR_VGG16_NPZ`` env var or
  explicit path) of HWIO arrays ``conv{i}_kernel`` / ``conv{i}_bias``; a
  converter from a torchvision state dict is provided
  (:func:`convert_torch_vgg16`).  With no weights available, this module's
  fallback is a FIXED seeded random init — but since round 2 that fallback
  is EXPLICIT-ONLY (``losses/perceptual.py: make_perceptual_fn`` kind
  'vgg-random'); the default perceptual distance without weights is the
  principled Gabor/LoG bank in losses/perceptual.py.
- Distance: L1 over features (magnitudes match the reference's logged
  ``perc`` ≈ 0.18 scale).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan through relu3_3: (features, layers-in-stage)
_VGG16_PLAN = ((64, 2), (128, 2), (256, 3))


class VGG16Features(nn.Module):
    """VGG16 conv stack through relu3_3; returns the final feature map."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv_idx = 0
        for stage, (feat, n_layers) in enumerate(_VGG16_PLAN):
            for _ in range(n_layers):
                x = nn.Conv(
                    feat, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            if stage < len(_VGG16_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def load_vgg16_params(npz_path: Optional[str] = None,
                      allow_env: bool = True) -> dict:
    """Load VGG16 feature params from npz, or build a fixed seeded init.

    ``allow_env=False`` ignores MRISR_VGG16_NPZ — the explicit
    'vgg-random' mode must stay random even when real weights are around,
    or ablations against it silently compare identical arms."""
    if allow_env:
        npz_path = npz_path or os.environ.get("MRISR_VGG16_NPZ")
    model = VGG16Features()
    if npz_path and os.path.exists(npz_path):
        data = np.load(npz_path)
        params = {}
        for i in range(7):
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
        return {"params": params}
    # deterministic random features (documented fallback)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(1234), dummy)


def convert_torch_vgg16(state_dict, out_npz: str) -> None:
    """Convert torchvision ``vgg16().features`` state dict -> our npz.

    torchvision indices of the first 7 convs: 0,2,5,7,10,12,14.
    """
    torch_idx = [0, 2, 5, 7, 10, 12, 14]
    arrs = {}
    for i, ti in enumerate(torch_idx):
        w = np.asarray(state_dict[f"features.{ti}.weight"])  # (O, I, H, W)
        b = np.asarray(state_dict[f"features.{ti}.bias"])
        arrs[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        arrs[f"conv{i}_bias"] = b
    np.savez(out_npz, **arrs)


def make_perceptual_fn(
    npz_path: Optional[str] = None, dtype=jnp.float32,
    allow_env: bool = True,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns perceptual(pred, target) -> scalar L1 feature distance.

    pred/target: (B, H, W, 1) single-channel images.
    """
    model = VGG16Features(dtype=dtype)
    variables = load_vgg16_params(npz_path, allow_env=allow_env)

    def perceptual(pred: jax.Array, target: jax.Array) -> jax.Array:
        # ONE concatenated forward instead of two: halves dispatches and
        # doubles the VGG batch on the MXU (training hot path)
        both = jnp.concatenate([pred, target], axis=0)
        f = model.apply(variables, jnp.repeat(both, 3, axis=-1))
        fp, ft = jnp.split(f, 2, axis=0)
        return jnp.mean(jnp.abs(fp - ft))

    return perceptual
