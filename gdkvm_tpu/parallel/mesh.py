"""Device mesh + sharding rules.

The reference's only parallelism is 2-GPU PyTorch DDP over NCCL
(reference: website/src/pages/[lang]/reprod/index.astro:238-239,
MASTER_PORT rendezvous).  The TPU-native equivalent (SURVEY.md §2.4) is a
``jax.sharding.Mesh`` with a ``('data', 'model')`` axis pair:

- **data**: batch dimension sharded; gradient/metric all-reduce is implicit
  in ``jit`` over the mesh (XLA collectives over ICI — no process groups,
  no ports, no NCCL).
- **model**: optional tensor parallelism for the LKVA head projections
  (heads split across chips).  Size 1 by default — the model fits one chip —
  but plumbed end-to-end so wider variants scale without code changes.

Multi-host: the same code runs under ``jax.distributed.initialize``; the
mesh just spans all processes' devices.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh.  data=-1 → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# LKVA projections whose *output* features are head-major (H*d): shard the
# Dense kernel's output dim over 'model' ⇒ heads split across chips.  The
# GDR recurrence is then fully chip-local per head (no inter-chip dependency
# in the recurrence — /root/repo/BASELINE.json north star).
_MODEL_SHARDED_KERNELS = re.compile(
    r"lkva/(q_proj|k_proj|v_proj|gate_proj|mask_proj|out_proj)/kernel$")


def param_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for params: replicate everything except the
    LKVA head projections, whose feature dim shards over 'model'."""
    model_parallel = mesh.shape[MODEL_AXIS] > 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf) -> NamedSharding:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        if model_parallel and leaf.ndim == 2 and _MODEL_SHARDED_KERNELS.search(name):
            if name.endswith("out_proj/kernel"):
                # out_proj consumes head-major features: shard input dim.
                if leaf.shape[0] % mesh.shape[MODEL_AXIS] == 0:
                    return NamedSharding(mesh, P(MODEL_AXIS, None))
            elif leaf.shape[1] % mesh.shape[MODEL_AXIS] == 0:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    leaves = [spec_for(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)
