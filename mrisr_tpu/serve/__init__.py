"""Serving-path optimizations: BN folding lives in ckpt/fold_bn.py; this
package adds post-training int8 quantization for the MXU's double-rate
int8 path (quant.py)."""

from mrisr_tpu.serve.quant import (  # noqa: F401
    calibrate_unet,
    quantize_unet,
    unet_int8_apply,
)
