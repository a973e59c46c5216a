"""Flax model zoo (NHWC, TPU-native).

Covers the reference inventory (SURVEY.md §2.2): M1-M4 blocks + UNet
(unet.py), M5 Progressive UNet (progressive.py), M6-M7 DeepCNN (deepcnn.py),
M8 UNet generator (unet.py with use_bias=False), M9 PatchGAN
(discriminator.py), M10-M13 diffusion nets + schedulers + samplers
(diffusion.py), V5 registry (registry.py).
"""

from mrisr_tpu.models.unet import UNet  # noqa: F401
from mrisr_tpu.models.deepcnn import DeepCNN  # noqa: F401
from mrisr_tpu.models.progressive import ProgressiveUNet  # noqa: F401
from mrisr_tpu.models.discriminator import PatchGAN  # noqa: F401
from mrisr_tpu.models.diffusion import (  # noqa: F401
    DiffusionSchedule,
    FastDDPMUNet,
    FastNoiseSchedule,
    SimpleDiffusionUNet,
)
from mrisr_tpu.models.registry import create_model, MODEL_REGISTRY  # noqa: F401
