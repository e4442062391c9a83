"""In-circuit IPA succinct-check and accumulation verifier vs native."""

import random

import pytest

from halo_tpu import acc as acc_mod
from halo_tpu import frontend as fe
from halo_tpu import pcdl
from halo_tpu.curves import PALLAS
from halo_tpu.frontend import Call
from halo_tpu.frontend.asdl import WireAccumulator, bind_accumulator
from halo_tpu.frontend.pcdl import WireInstance, WirePublicParams, bind_instance

rng = random.Random(55)


@pytest.fixture(autouse=True)
def fresh_frontend():
    fe.reset()
    yield
    fe.reset()


def _rand_instance(cfg, n):
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    return pcdl.Instance.open(cfg, p, n - 1, z, w=None)


def test_in_circuit_succinct_check_accepts():
    cfg = PALLAS
    n = 8
    inst = _rand_instance(cfg, n)
    pcdl.succinct_check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)

    pp = WirePublicParams.new(cfg, n)
    wire_inst = WireInstance.witness(cfg, n)
    ok, h, U = wire_inst.succinct_check(pp)
    ok.output()

    call = Call()
    bind_instance(call, wire_inst, inst)
    fp_trace, fq_trace = call.trace()
    # ok is a base-field (Fq) bool
    assert fq_trace.outputs == [1]


def test_in_circuit_succinct_check_rejects_tampered():
    cfg = PALLAS
    n = 8
    inst = _rand_instance(cfg, n)
    inst.v = (inst.v + 1) % cfg.r

    pp = WirePublicParams.new(cfg, n)
    wire_inst = WireInstance.witness(cfg, n)
    ok, _, _ = wire_inst.succinct_check(pp)
    ok.output()

    call = Call()
    bind_instance(call, wire_inst, inst)
    _, fq_trace = call.trace()
    assert fq_trace.outputs == [0]


def test_in_circuit_acc_verifier_accepts():
    cfg = PALLAS
    n = 8
    q1 = _rand_instance(cfg, n)
    q2 = _rand_instance(cfg, n)
    acc = acc_mod.prover(cfg, [q1, q2])
    acc_mod.verifier(cfg, [q1, q2], acc)

    pp = WirePublicParams.new(cfg, n)
    wire_q1 = WireInstance.witness(cfg, n)
    wire_q2 = WireInstance.witness(cfg, n)
    wire_acc = WireAccumulator.witness(cfg, n)
    ok = wire_acc.verify(pp, [wire_q1, wire_q2])
    ok.output()

    call = Call()
    bind_instance(call, wire_q1, q1)
    bind_instance(call, wire_q2, q2)
    bind_accumulator(call, wire_acc, acc)
    fp_trace, fq_trace = call.trace()
    # verify() message-passes into the scalar field (Fp)
    assert fp_trace.outputs == [1]


@pytest.mark.slow
def test_in_circuit_succinct_check_proves():
    # the succinct-check circuit itself proves and verifies on both curves
    from halo_tpu.plonk import protocol

    cfg = PALLAS
    n = 4
    inst = _rand_instance(cfg, n)
    pp = WirePublicParams.new(cfg, n)
    wire_inst = WireInstance.witness(cfg, n)
    ok, _, _ = wire_inst.succinct_check(pp)
    ok.output()

    call = Call()
    bind_instance(call, wire_inst, inst)
    fp_trace, fq_trace = call.trace()
    assert fq_trace.outputs == [1]
    for t in (fp_trace, fq_trace):
        circuit, x, w = t.consume()
        proof = protocol.naive_prover(t.cfg, circuit, x, w)
        protocol.verify(t.cfg, proof, circuit, x)
