"""Persistent JAX compilation cache, enabled explicitly at entry points.

XLA compilation over the development TPU tunnel costs minutes per distinct
program and dominates short measurement runs (bench.py is ~6 min, mostly
compile).  This used to live in a repo-root ``sitecustomize.py``, which was
(a) inert in every documented launch mode — CPython adds the script dir /
cwd to ``sys.path`` *after* the ``site`` module runs, so the repo-root copy
was never imported — and (b) actively dangerous when it *was* imported
(``PYTHONPATH=/root/repo``): it shadowed the axon TPU plugin's own
``sitecustomize.py`` and broke TPU access entirely.  See ADVICE.md (r4).

The replacement is this explicit call, made by the real entry points
(``bench.py``, ``mrisr_tpu.cli:main``, ``__graft_entry__.py``,
``tests/conftest.py``, the ``benchmarks/*.py`` scripts).

Override the location with ``MRISR_JAX_CACHE``; set it empty to disable.
"""

from __future__ import annotations

import getpass
import os
import sys
import tempfile


def _default_cache_dir() -> str:
    home = os.path.expanduser("~")
    if home and home != "/" and os.path.isdir(home):
        return os.path.join(home, ".cache", "mrisr_jax")
    # fall back to a per-user tempdir path (avoid a world-shared /tmp dir)
    user = getpass.getuser() if hasattr(getpass, "getuser") else "mrisr"
    return os.path.join(tempfile.gettempdir(), f"mrisr_jax_cache_{user}")


def enable_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a per-user directory.

    Returns the cache dir on success, ``None`` when disabled or on failure
    (a one-line warning goes to stderr — a silently-disabled cache must be
    distinguishable from a working one).
    """
    cache_dir = os.environ.get("MRISR_JAX_CACHE")
    if cache_dir == "":
        return None
    # CPU runs (tests, the driver's virtual-mesh dryrun) compile in seconds
    # and XLA:CPU's AOT reload warns about machine-feature mismatches — the
    # cache only pays for itself on the TPU tunnel, so skip it on CPU.
    if cache_dir is None and os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return None
    if cache_dir is None:
        cache_dir = _default_cache_dir()
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took >=1 s to compile; tiny test-suite
        # programs stay out, the tunnel-bound ones all land
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as exc:  # pragma: no cover — jax absent/flag renamed
        print(f"mrisr: compilation cache disabled ({exc})", file=sys.stderr)
        return None
