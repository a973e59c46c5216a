"""Device mesh construction + sharding rules.

Design (SURVEY.md §2.5 "TPU-native equivalent to build"):

- 2-D logical mesh ``('data', 'model')``.  All six reference configs are
  data-parallel (models are 2-93 M params — replicate params, shard the
  batch); the 'model' axis exists so tensor-parallel runs need only a mesh
  reshape, no code change: with ``model > 1`` conv/dense kernels are sharded
  on their output-channel dim and GSPMD inserts the collectives over ICI.
- Gradient reduction: under ``jit`` with a batch sharded on 'data' and
  replicated params, XLA emits the cross-chip ``psum`` for the grad mean
  automatically — the explicit wrappers here are for shard_map users.
- Multi-host: :func:`distributed_init` wraps ``jax.distributed.initialize``;
  each host feeds its own patient shard (data/pipeline.py loaders take any
  ``NamedSharding``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1    # -1 -> all remaining devices
    model: int = 1


def make_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec.model < 1:
        # only the DATA axis supports -1 = "all remaining"; silently
        # coercing model=-1 to 1 would run unsharded where the user asked
        # for tensor parallelism
        raise ValueError(
            f"MeshSpec.model must be >= 1 (got {spec.model}); "
            "-1 is only meaningful for the data axis"
        )
    model = spec.model
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    data = spec.data if spec.data > 0 else n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def param_shardings(params, mesh: Mesh, min_size: int = 2**16):
    """Per-leaf NamedShardings: replicate by default; when the 'model' axis
    is >1, shard large kernels on their trailing (output-feature) dim.

    Conv kernels are HWIO and Dense kernels are (in, out), so the trailing
    dim is the output-channel dim in both cases — the natural Megatron-style
    column split whose collectives GSPMD places over ICI.
    """
    model_size = mesh.shape["model"]

    def rule(leaf):
        if (
            model_size > 1
            and leaf.ndim >= 2
            and leaf.shape[-1] % model_size == 0
            and leaf.size >= min_size
        ):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


# ------------------------------------------------------- shard_map helpers


def psum_mean(x, axis_name: str = "data"):
    """Cross-chip mean for explicit shard_map/pmap code paths."""
    return jax.lax.pmean(x, axis_name)


def all_gather_batch(x, axis_name: str = "data"):
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
