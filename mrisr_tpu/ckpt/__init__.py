"""Checkpointing: Orbax-backed save/restore with best/latest/per-epoch
semantics + the PyTorch-checkpoint converter (torch_convert.py).

Reproduces the reference's capabilities (SURVEY.md §5 "Failure detection /
checkpoint formats"): best + latest files (T1,
`/root/reference/src/unet_model.py:247-265`), per-epoch resumable
checkpoints with full state — params, optimizer, history, best loss,
timestamp — and latest-by-epoch discovery (T7, `Fixed:cell9`).
"""

from mrisr_tpu.ckpt.io import (  # noqa: F401
    get_latest_checkpoint,
    restore_checkpoint,
    restore_checkpoint_numpy,
    save_checkpoint,
    wait_for_async_saves,
)
from mrisr_tpu.ckpt.torch_convert import (  # noqa: F401
    convert_torch_checkpoint,
)
