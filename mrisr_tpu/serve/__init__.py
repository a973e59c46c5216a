"""Serving layer: BN folding lives in ckpt/fold_bn.py; this package adds
post-training int8 quantization for the MXU's double-rate int8 path
(quant.py) and the micro-batching inference runtime (engine.py)."""

from mrisr_tpu.serve.engine import (  # noqa: F401
    EngineStats,
    InferenceEngine,
    engine_from_model,
)
from mrisr_tpu.serve.bundle import (  # noqa: F401
    engine_from_bundle,
    export_serving_bundle,
    load_bundle,
    save_bundle,
)
from mrisr_tpu.serve.http import (  # noqa: F401
    ServingServer,
    serve_bundle,
)
from mrisr_tpu.serve.quant import (  # noqa: F401
    calibrate_unet,
    quantize_unet,
    unet_int8_apply,
    unet_int8_fused_apply,
)
from mrisr_tpu.serve.quant_diffusion import (  # noqa: F401
    calibrate_fastddpm,
    fastddpm_int8_apply,
    quantize_fastddpm,
)
from mrisr_tpu.serve.distill_diffusion import (  # noqa: F401
    distill_sampler_round,
    progressive_distill,
    sample_ddim_grid,
    subgrid_schedule,
)
