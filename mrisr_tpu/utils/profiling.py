"""Profiler + debug hooks (SURVEY.md §5 aux subsystems).

- ``profile_trace`` wraps ``jax.profiler.trace`` (view in TensorBoard /
  Perfetto) — the tracing capability the reference lacked.
- ``enable_nan_debug`` flips ``jax_debug_nans`` — the JAX-functional
  equivalent of a sanitizer pass (no data races exist by construction).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def enable_nan_debug(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)
