"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip (data-parallel) logic must be
testable without TPUs, via ``--xla_force_host_platform_device_count``.
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS; force CPU
# explicitly so tests always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

from mrisr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_volume(rng):
    """A small synthetic (Z, H, W) volume with smooth structure."""
    from mrisr_tpu.data.synthetic import make_synthetic_volume

    return make_synthetic_volume(num_slices=12, height=64, width=64, seed=0)
