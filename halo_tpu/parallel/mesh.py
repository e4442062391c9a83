"""Device mesh construction for multi-chip proving.

The scaling axes (SURVEY.md §2.6 mapping):
  "data"  — points/scalars/coefficients sharded across chips (dp analog);
            MSM bucket partials reduced over ICI (tp analog);
            NTT re-shards via all_to_all when butterfly strides cross the
            shard boundary (sp analog)
  curve pipeline parallelism (pp analog) runs the Pallas-proof and
  Vesta-proof on disjoint sub-meshes (see parallel/pipeline.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_leading(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec()))
