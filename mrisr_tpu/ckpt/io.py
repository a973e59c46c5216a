"""Orbax checkpoint IO.

Checkpoint layout: one Orbax directory per checkpoint named
``<prefix>_best`` / ``<prefix>_latest`` / ``<prefix>_epoch_<N>``, holding the
full resumable state: params, batch_stats, optimizer state, epoch, history
series, best_loss (T7 contract; timestamps live in the history JSON).
"""

from __future__ import annotations

import atexit
import os
import re
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _abspath(p: str) -> str:
    return os.path.abspath(p)


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_async_ckptr.wait_until_finished)
    return _async_ckptr


def save_checkpoint(path: str, state: Any, async_: bool = False) -> None:
    """Save a pytree (dict of arrays / nested dicts / scalars) to ``path``.

    ``async_=True`` returns immediately; the write completes in the
    background (Orbax async) and is flushed before the next save to the
    same process or at interpreter exit.  Per-epoch saves of the 93 M-param
    Progressive UNet (+Adam state ~1 GB) don't stall the step loop.
    """
    path = _abspath(path)
    if async_:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, state, force=True)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def wait_for_async_saves() -> None:
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; ``template`` (matching structure with abstract or
    concrete arrays) enables exact dtype/sharding restoration.

    Templateless restores are device-portable: when the checkpoint's saved
    sharding metadata names devices this host doesn't have (a TPU-written
    checkpoint opened on a CPU-only box), the restore falls back to plain
    host numpy leaves instead of failing.
    """
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template
        )
        return ckptr.restore(path, template)
    try:
        return ckptr.restore(path)
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        return restore_checkpoint_numpy(path)


def restore_checkpoint_numpy(path: str) -> Any:
    """Device-agnostic restore: every leaf comes back as host numpy,
    ignoring the checkpoint's saved device/sharding metadata entirely."""
    import numpy as np

    path = _abspath(path)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta_tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
    )
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(
        restore_args=restore_args))


def get_latest_checkpoint(
    checkpoint_dir: str, prefix: str
) -> Optional[Tuple[str, int]]:
    """Find ``<prefix>_epoch_<N>`` with the highest N (T7's
    ``get_latest_checkpoint``, `Fixed:cell9`).  Returns (path, epoch)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    pat = re.compile(re.escape(prefix) + r"_epoch_(\d+)$")
    best = None
    for name in os.listdir(checkpoint_dir):
        m = pat.match(name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[1]:
                best = (os.path.join(checkpoint_dir, name), epoch)
    return best
