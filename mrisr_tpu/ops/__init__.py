"""TPU compute ops: the kernels PyTorch supplied implicitly in the reference.

SURVEY.md §2 notes the reference has zero native components; its
native-performance surface is PyTorch's bundled CUDA kernels (conv2d, resize,
SSIM window ops, diffusion loop).  Here those live as XLA programs plus a
fused Pallas SSIM kernel for the metric hot path.
"""

from mrisr_tpu.ops.resize import resize_bilinear  # noqa: F401
from mrisr_tpu.ops.stats import zscore_slices  # noqa: F401
from mrisr_tpu.ops.ssim import ssim, psnr, ssim_loss  # noqa: F401
from mrisr_tpu.ops.augment import paired_augment  # noqa: F401
