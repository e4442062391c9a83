"""Curve pipeline parallelism (the reference's pp analog, SURVEY.md §2.6).

The two proofs of an IVC step — the Fp circuit proven on Pallas and the Fq
circuit proven on Vesta — are fully independent (reference
crates/plonk/src/frontend/ivc/mod.rs:648-649 runs them back to back on one
machine).  Here each proof runs on its own disjoint sub-mesh: the host
orchestration threads run concurrently (device ops release the GIL) and
every device op a task issues is pinned to its sub-mesh's devices.

Usage:
    fp_proof, fq_proof = run_disjoint(mesh, [prove_fp, prove_fq])
where each task is `task(sub_mesh) -> result`.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
from jax.sharding import Mesh


def split_mesh(mesh: Mesh, k: int) -> list[Mesh]:
    """Partition a 1-D "data" mesh into k disjoint sub-meshes.

    With fewer than k devices the sub-meshes degenerate to (possibly
    shared) single-device meshes so the pipeline still runs everywhere.
    """
    devs = list(mesh.devices.flat)
    if len(devs) < k:
        return [Mesh(np.array([devs[i % len(devs)]]), ("data",)) for i in range(k)]
    per = len(devs) // k
    return [Mesh(np.array(devs[i * per : (i + 1) * per]), ("data",)) for i in range(k)]


def run_disjoint(mesh: Mesh, tasks) -> list:
    """Run tasks concurrently, task i on sub-mesh i (pp over the curve axis).

    Each task is a callable(sub_mesh) -> result.  Single-device ops inside a
    task (jnp/jit calls that don't name a mesh) are pinned to the sub-mesh's
    first device via jax.default_device, so two provers never contend for
    the same chip; sharded ops should use the passed sub-mesh explicitly.
    """
    subs = split_mesh(mesh, len(tasks))

    def _run(task, sub):
        with jax.default_device(list(sub.devices.flat)[0]):
            return task(sub)

    with ThreadPoolExecutor(max_workers=len(tasks)) as ex:
        futs = [ex.submit(_run, t, s) for t, s in zip(tasks, subs)]
        return [f.result() for f in futs]
