"""In-circuit PLONK verifier verifying a real proof (reference frontend/plonk tests)."""

import random

import pytest

from halo_tpu import frontend as fe
from halo_tpu.curves import PALLAS
from halo_tpu.frontend import Call, WireScalar
from halo_tpu.frontend.plonk import (
    WirePlonkCircuit,
    WirePlonkProof,
    WirePlonkPublicInputs,
    bind_plonk_proof,
    bind_plonk_public_inputs,
)
from halo_tpu.plonk import protocol
from halo_tpu.plonk.circuit import FP, CircuitSpec, TraceBuilder
from halo_tpu.plonk.trace import trace_pair

rng = random.Random(21)


@pytest.fixture(autouse=True)
def fresh_frontend():
    fe.reset()
    yield
    fe.reset()


def _small_proof():
    """A tiny proven circuit on the Pallas side."""
    spec = CircuitSpec()
    x = spec.fp_witness()
    y = spec.fp_witness()
    out = spec.mul_gate(spec.add_gate(x, y), x)
    spec.output_gate(out)
    tb = TraceBuilder(spec)
    tb.witness(x, 3)
    tb.witness(y, 4)
    fp_trace, _ = trace_pair(tb)
    circuit, pub, w = fp_trace.consume()
    proof = protocol.naive_prover(PALLAS, circuit, pub, w)
    protocol.verify_succinct(PALLAS, proof, circuit, pub)
    return circuit, pub, proof


def test_in_circuit_plonk_verifier_accepts():
    circuit, pub, proof = _small_proof()
    cfg = PALLAS
    n = circuit.rows

    wire_circuit = WirePlonkCircuit.constant(cfg, circuit)
    wire_proof = WirePlonkProof.witness(cfg, n)
    wire_pub = WirePlonkPublicInputs.witness(cfg, n, circuit.public_input_count)
    ok = wire_proof.verify_succinct(wire_circuit, wire_pub)
    ok.output()

    call = Call()
    bind_plonk_proof(call, wire_proof, proof)
    bind_plonk_public_inputs(call, wire_pub, pub)
    # raw trace only: the full Trace.new would commit 41 polys at this size
    fp_data, fq_data = call.trace_builder.trace()
    assert fp_data.outputs == [1]


def test_in_circuit_plonk_verifier_rejects_tampered():
    circuit, pub, proof = _small_proof()
    cfg = PALLAS
    n = circuit.rows
    proof.vs.z = (proof.vs.z + 1) % cfg.r

    wire_circuit = WirePlonkCircuit.constant(cfg, circuit)
    wire_proof = WirePlonkProof.witness(cfg, n)
    wire_pub = WirePlonkPublicInputs.witness(cfg, n, circuit.public_input_count)
    ok = wire_proof.verify_succinct(wire_circuit, wire_pub)
    ok.output()

    call = Call()
    bind_plonk_proof(call, wire_proof, proof)
    bind_plonk_public_inputs(call, wire_pub, pub)
    fp_data, _ = call.trace_builder.trace()
    assert fp_data.outputs == [0]
