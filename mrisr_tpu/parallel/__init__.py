"""Distributed layer: mesh, shardings, collectives.

The reference has NO distributed communication backend (its only brush with
parallelism is a dead ``nn.DataParallel`` wrap, SURVEY.md §2.5).  This layer
is the first-class TPU equivalent: a named device mesh, batch/param
shardings over ICI, and multi-host init — all testable on a virtual CPU mesh.
"""

from mrisr_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    distributed_init,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
