"""Model registry: name -> architecture, mirroring ``load_model``'s map
(`/root/reference/src/ModelLoader.py:662-669`):

  unet / unet_combined -> UNet (bias, 64 features)
  deepcnn              -> DeepCNN ([2,2,2,2], 64)
  progressive_unet     -> ProgressiveUNet (64)
  unet_gan             -> UNet generator (bias-free, 64)
  fastddpm             -> FastDDPMUNet (trained notebook lineage)
  fastddpm_simple      -> SimpleDiffusionUNet (ckpt-compatible M10)

Checkpoint loading lives in mrisr_tpu.ckpt (Orbax) with a PyTorch-name
converter for the reference's three dict layouts.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from mrisr_tpu.config import ModelConfig
from mrisr_tpu.models.deepcnn import DeepCNN
from mrisr_tpu.models.diffusion import FastDDPMUNet, SimpleDiffusionUNet
from mrisr_tpu.models.discriminator import PatchGAN
from mrisr_tpu.models.progressive import ProgressiveUNet
from mrisr_tpu.models.unet import UNet


def _unet(cfg: ModelConfig, dtype):
    return UNet(out_channels=cfg.out_channels, features=cfg.base_features,
                use_bias=True, dtype=dtype, remat=cfg.remat)


def _unet_gan(cfg: ModelConfig, dtype):
    return UNet(out_channels=cfg.out_channels, features=cfg.base_features,
                use_bias=False, dtype=dtype, remat=cfg.remat)


def _deepcnn(cfg: ModelConfig, dtype):
    return DeepCNN(out_channels=cfg.out_channels,
                   base_features=cfg.base_features,
                   num_blocks=tuple(cfg.num_blocks), dtype=dtype)


def _progressive(cfg: ModelConfig, dtype):
    return ProgressiveUNet(base_features=cfg.base_features, dtype=dtype)


def _fastddpm(cfg: ModelConfig, dtype):
    return FastDDPMUNet(base_features=cfg.base_features,
                        time_dim=cfg.time_dim, dtype=dtype)


def _fastddpm_simple(cfg: ModelConfig, dtype):
    return SimpleDiffusionUNet(base_features=cfg.base_features,
                               time_dim=256, dtype=dtype)


def _patchgan(cfg: ModelConfig, dtype):
    return PatchGAN(base_features=cfg.base_features, dtype=dtype)


# name -> (factory, input kind)
#   'pair'    : (B, H, W, 2)  [pre, post]
#   'window'  : (B, H, W, 5)  [i..i+4]
#   'diffusion': (B, H, W, 3) + (B,) t
MODEL_REGISTRY: Dict[str, Tuple[Callable, str]] = {
    "unet": (_unet, "pair"),
    "unet_combined": (_unet, "pair"),
    # serving-distillation student (serve/distill.py): same M2 topology at
    # reduced width; base_features comes from the 'unet_distilled' preset
    "unet_distilled": (_unet, "pair"),
    "deepcnn": (_deepcnn, "pair"),
    "progressive_unet": (_progressive, "window"),
    "unet_gan": (_unet_gan, "pair"),
    "fastddpm": (_fastddpm, "diffusion"),
    "fastddpm_simple": (_fastddpm_simple, "diffusion"),
    "patchgan": (_patchgan, "pair"),
}


def create_model(name: str, cfg: ModelConfig | None = None, dtype=jnp.float32):
    """Instantiate a model module by registry name."""
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model: {name}. Choose from: {sorted(MODEL_REGISTRY)}"
        )
    factory, kind = MODEL_REGISTRY[name]
    if cfg is None:
        # presets may override architecture hyperparameters (e.g. the
        # unet_distilled student's base_features=32) — plain
        # ModelConfig(name=...) defaults only cover the reference models
        from mrisr_tpu.config import PRESETS

        cfg = PRESETS[name].model if name in PRESETS else ModelConfig(name=name)
    return factory(cfg, dtype), kind


def init_model(name: str, cfg: ModelConfig | None = None, dtype=jnp.float32,
               image_size=(256, 256), seed: int = 0):
    """Create + init variables with dummy inputs of the right kind."""
    model, kind = create_model(name, cfg, dtype)
    h, w = image_size
    key = jax.random.PRNGKey(seed)
    if kind == "pair":
        x = jnp.zeros((1, h, w, 3 if name == "patchgan" else 2), jnp.float32)
        variables = model.init(key, x, train=False)
    elif kind == "window":
        x = jnp.zeros((1, h, w, 5), jnp.float32)
        variables = model.init(key, x, train=False)
    elif kind == "diffusion":
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        variables = model.init(key, x, t)
    else:
        raise ValueError(kind)
    return model, variables, kind


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
