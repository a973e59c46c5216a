"""Evaluation layer: metrics (V6/V11), volume-level prediction (V7-V9),
comparison figures (V10)."""

from mrisr_tpu.eval.metrics import (  # noqa: F401
    compute_metrics,
    per_sample_metrics,
    spacing_metrics,
)
from mrisr_tpu.eval.volume_eval import (  # noqa: F401
    predict_volume,
    predict_volume_hierarchical,
    predict_volume_progressive,
)
