"""mrisr_tpu — TPU-native multi-image super-resolution for medical slice interpolation.

A brand-new JAX / Flax / XLA / Pallas framework with the capabilities of
``DeivanaiThiyagarajan/Multi-Image-Super-Resolution-for-Medical-Images``:
given two neighboring prostate T2-weighted MRI slices, synthesize the missing
middle slice at 3 mm (``i, i+2 -> i+1``) and 6 mm (``i, i+4 -> i+2``)
through-plane spacings.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- ``mrisr_tpu.data``     — DICOM ingest, packed volume store, pure-index triplet
  math, device-side augmentation, sharded host feeding.
- ``mrisr_tpu.models``   — Flax model zoo: UNet (MSE / combined / GAN generator),
  DeepCNN, 3-stage Progressive UNet, PatchGAN discriminator, Fast-DDPM nets.
- ``mrisr_tpu.ops``      — XLA/Pallas compute ops: bilinear resize, per-slice
  z-score, fused SSIM window kernel.
- ``mrisr_tpu.losses``   — MSE / L1 / SSIM / VGG-perceptual / LSGAN / combined.
- ``mrisr_tpu.parallel`` — mesh construction, shardings, collectives (the
  distributed-communication layer the reference lacked).
- ``mrisr_tpu.train``    — jitted train/eval steps, early stopping, GAN /
  progressive / diffusion trainers, history artifacts.
- ``mrisr_tpu.eval``     — SSIM/PSNR/MAE volume metrics, volume-level prediction
  incl. the hierarchical 3-stage cascade, comparison figures.
- ``mrisr_tpu.ckpt``     — Orbax checkpointing + PyTorch-checkpoint converter.

Array convention: compute is NHWC (TPU-native, channels on the 128-lane axis);
the public API keeps the reference's ``(B, 2, H, W) -> (B, 1, H, W)`` NCHW
contract via thin adapters in :mod:`mrisr_tpu.api`.
"""

__version__ = "0.1.0"

from mrisr_tpu.config import PRESETS, Config  # noqa: F401
