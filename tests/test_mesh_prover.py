"""Mesh-sharded prover path (round-4 verdict missing #1 / task 2).

The reference's prover is parallel by construction (every arkworks dep has
features=["parallel"], crates/group/Cargo.toml:17-24); the TPU analog is an
Engine configured with a jax.sharding.Mesh: commitments dispatch through the
sharded v2 MSM and large NTTs through the 4-step all_to_all distributed NTT.
These tests run on the virtual 8-device CPU mesh (tests/conftest.py) and
assert BYTE equality with the single-chip proof.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.curves import PALLAS
from halo_tpu.ops import ff
from halo_tpu.parallel.mesh import data_mesh

rng = random.Random(77)


@pytest.mark.slow
def test_sharded_srs_commit_matches_host():
    """msm2_srs_rows_sharded (the Engine's mesh commit path) vs native."""
    from halo_tpu import native
    from halo_tpu.parallel import msm as pmsm
    from halo_tpu.srs import load_srs

    n, k = 64, 2
    mesh = data_mesh(8)
    kss = [[rng.randrange(PALLAS.r) for _ in range(n)] for _ in range(k)]
    K = jnp.stack([jnp.transpose(jnp.asarray(ff.ints_to_array(ks))) for ks in kss])
    got = pmsm.msm2_srs_rows_sharded(PALLAS, mesh, K, n)
    pp = load_srs("pallas", n)
    want = [native.msm(PALLAS, ks, pp.gs_ints(n)) for ks in kss]
    assert got == want


@pytest.mark.slow
def test_mesh_engine_ntt_matches_single():
    from halo_tpu.plonk.engine import engine_for

    n = 256
    mesh = data_mesh(8)
    vals = [rng.randrange(PALLAS.r) for _ in range(n)]
    eng0 = engine_for(PALLAS)
    engm = engine_for(PALLAS, mesh=mesh)
    a = eng0.to_dev(vals)
    assert np.array_equal(np.asarray(engm.ntt(a)), np.asarray(eng0.ntt(a)))
    assert np.array_equal(np.asarray(engm.intt(a)), np.asarray(eng0.intt(a)))
    assert np.array_equal(np.asarray(engm.ntt_extended(a, 2 * n)),
                          np.asarray(eng0.ntt_extended(a, 2 * n)))


@pytest.mark.slow
def test_mesh_prover_proof_bytes_equal():
    """Full PLONK proof through the mesh-sharded engine == single-chip."""
    from halo_tpu.plonk import protocol
    from halo_tpu.plonk.circuit import CircuitSpec, TraceBuilder
    from halo_tpu.plonk.trace import trace_pair

    spec = CircuitSpec()
    x = spec.fp_witness()
    y = spec.fp_witness()
    out = spec.mul_gate(spec.add_gate(x, y), spec.add_gate(x, x))
    spec.assert_eq_gate(out, out)
    spec.output_gate(out)
    tb = TraceBuilder(spec)
    tb.witness(x, 5)
    tb.witness(y, 9)
    fp_trace, _ = trace_pair(tb)
    circuit, pub, w = fp_trace.consume()

    single = protocol.naive_prover(PALLAS, circuit, pub, w, device=True)
    mesh = data_mesh(8)
    sharded = protocol.naive_prover(PALLAS, circuit, pub, w, mesh=mesh)
    assert sharded.to_bytes(PALLAS) == single.to_bytes(PALLAS)
    protocol.verify(PALLAS, sharded, circuit, pub)
