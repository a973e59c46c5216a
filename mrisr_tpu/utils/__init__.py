"""Utilities: structured logging, profiling hooks, debug toggles."""

from mrisr_tpu.utils.logging import get_logger, StepTimer  # noqa: F401
from mrisr_tpu.utils.profiling import profile_trace, enable_nan_debug  # noqa: F401
from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: F401
