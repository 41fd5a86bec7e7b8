"""Device mesh construction.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3: no
NCCL/MPI/dist anywhere; SLURM scripts request one GPU). Multi-chip scale is
therefore designed TPU-first here rather than ported: a ('data', 'model')
mesh where

- 'data'  : batch sharding; embedding all-gather makes InfoNCE negatives
            span the mesh (the GradCache global batch, but over ICI);
- 'model' : tensor parallelism for the ESM-2 backbone (heads / FFN
            intermediate sharding) for backbone variants that outgrow one
            chip (esm2_t36_3B+).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh. data defaults to n_devices // model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n_data}")
    return global_batch // n_data
