"""Multi-host runtime: jax.distributed + global meshes (SURVEY §2.6).

The reference is single-process (rayon threads); the TPU build's scaling
story spans hosts: intra-slice traffic rides ICI, cross-slice/host traffic
rides DCN.  JAX's standard multi-controller runtime handles both — every
host runs the same program, `jax.distributed.initialize` wires the
processes together, and named-mesh collectives (`psum`, `all_to_all`,
`ppermute` in parallel/msm.py and parallel/ntt.py) compile to ICI/DCN
transfers automatically based on device placement.

Layout guidance for the proving workload:
  * shard MSM points/scalars and NTT coefficients across ALL devices
    ("data" axis); the MSM bucket reduction is the only cross-chip traffic
    and is O(buckets) per window — keep it on ICI by ordering the mesh so
    adjacent ranks share a slice
  * run the two curve proofs (pp analog, parallel/pipeline.py) on disjoint
    sub-slices so their collectives never share links
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, TPU pod environments auto-discover peers from the
    TPU metadata; on CPU/GPU or custom clusters pass the coordinator
    explicitly (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  Single-process runs are a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        _INITIALIZED = True  # single-process: nothing to wire up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    _INITIALIZED = True


def global_data_mesh() -> Mesh:
    """1-D "data" mesh over ALL devices across every host.

    jax.devices() enumerates global devices once the distributed runtime is
    up; sharded arrays built on this mesh place each host's shard on its
    local chips, so `shard_map` collectives ride ICI within a slice and DCN
    across hosts without further annotation.
    """
    return Mesh(np.array(jax.devices()), ("data",))


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    return jax.process_index()
