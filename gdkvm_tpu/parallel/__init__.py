"""SPMD distribution: device mesh, named shardings, collective helpers."""

from gdkvm_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
