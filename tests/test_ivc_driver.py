"""IVC driver plumbing: init, base-case verify, and full witness binding.

The production-size end-to-end chain (rows=65536 — the circuit's only
row-count fixed point, like the reference's hard-coded IVC_FP_CIRCUIT)
runs via tools/ivc_demo.py on the TPU box; results recorded in
BENCH_NOTES.md.  These tests cover everything up to (but excluding) the
two naive_prover calls of IVCState.prove (reference ivc/mod.rs:607-652):
state construction, the zero proof/accumulator base case, the wire-circuit
build at the frozen shape, and binding a real IVCState into it without
arity or field-id errors.
"""

import pytest

from halo_tpu.curves import PALLAS, VESTA
from halo_tpu.frontend import ivc as ivc_mod
from halo_tpu.frontend.ivc import IVCState, _params_from_reference_fixture

ROWS = 65536


@pytest.fixture(scope="module")
def params():
    p = _params_from_reference_fixture()
    assert p is not None, "tests/fixtures/ivc_consts.json missing"
    return p


def test_init_base_case(params):
    state = IVCState.init(params)
    assert state.i == 0
    # base-case proof: all-identity commitments, zero evals, zero accumulator
    assert all(c is None for c in state.fp_proof.Cs.ws)
    assert state.fp_proof.Cs.z is None
    assert state.fp_public_input.acc_prev.q.d == ROWS - 1
    assert len(state.fp_public_input.public_inputs) == 405
    assert len(state.fq_public_input.public_inputs) == 725
    # i == 0 accepts without running the verifiers (ivc/mod.rs:666-674)
    state.verify()


def test_zero_accumulator_consistency(params):
    from halo_tpu import acc as acc_mod

    a0 = acc_mod.zero_accumulator(PALLAS, ROWS, 1)
    state = IVCState.init(params)
    assert state.fp_public_input.acc_prev.q.C == a0.q.C
    assert state.fp_public_input.acc_prev.q.z == a0.q.z


@pytest.mark.slow
def test_wire_circuit_binds_full_state(params):
    """Build the frozen-shape wire circuit and bind a real IVCState into it;
    exercises every bind_* path (proofs, PIs, accumulators, signature) and
    the public-input arity of the frozen circuits."""
    from halo_tpu.frontend import Call, reset
    from halo_tpu.frontend.ivc import (
        WireIVCState,
        bind_ivc_state,
        bind_plonk_circuit,
    )
    from halo_tpu.frontend.plonk import WirePlonkCircuit
    from halo_tpu.frontend.primitives import WireAffine

    state = IVCState.init(params)
    fp_pi = params.fp_circuit.public_input_count
    fq_pi = params.fq_circuit.public_input_count

    reset()
    wire_fp_c = WirePlonkCircuit.public_input(PALLAS, ROWS, fp_pi)
    wire_fq_c = WirePlonkCircuit.public_input(VESTA, ROWS, fq_pi)
    wire_state = WireIVCState.witness(ROWS, fp_pi, fq_pi)
    wire_pk_next = WireAffine.witness(PALLAS)
    wire_state.ivc_circuit(wire_fp_c, wire_fq_c, wire_pk_next)

    call = Call()
    bind_plonk_circuit(call, wire_fp_c, params.fp_circuit)
    bind_plonk_circuit(call, wire_fq_c, params.fq_circuit)
    call.witness_affine(wire_pk_next, PALLAS.generator)
    bind_ivc_state(call, wire_state, state)
    reset()
