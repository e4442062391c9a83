"""Frontend eDSL differential tests: in-circuit vs native (SURVEY §4 item 4)."""

import random

import pytest

from halo_tpu import frontend as fe
from halo_tpu import schnorr
from halo_tpu.curves import PALLAS, VESTA, ec_add, ec_mul
from halo_tpu.fields import FP_MOD, FQ_MOD
from halo_tpu.frontend import Call, WireAffine, WireBool, WireScalar
from halo_tpu.frontend.signature import WireSchnorrSignature, bind_signature
from halo_tpu.frontend.sponge import InnerSponge, OuterSponge
from halo_tpu.plonk import protocol
from halo_tpu.poseidon.sponge import PoseidonSponge, Protocols, Sponge, permute

rng = random.Random(8)


@pytest.fixture(autouse=True)
def fresh_frontend():
    fe.reset()
    yield
    fe.reset()


def prove_both(fp_trace, fq_trace):
    for t in (fp_trace, fq_trace):
        circuit, x, w = t.consume()
        proof = protocol.naive_prover(t.cfg, circuit, x, w)
        protocol.verify(t.cfg, proof, circuit, x)


def test_field_ops_match_native():
    x_v = rng.randrange(FP_MOD)
    y_v = rng.randrange(FP_MOD)
    x = WireScalar.witness(PALLAS)
    y = WireScalar.witness(PALLAS)
    c = x * y
    d = c + WireScalar.constant(PALLAS, 42)
    e = d - x
    f = e / y
    f.output()
    call = Call()
    call.witness(x, x_v)
    call.witness(y, y_v)
    fp_trace, fq_trace = call.trace()
    expected = (x_v * y_v + 42 - x_v) % FP_MOD * pow(y_v, -1, FP_MOD) % FP_MOD
    assert fp_trace.outputs == [expected]
    prove_both(fp_trace, fq_trace)


def test_bool_ops_match_native():
    a = WireBool.witness(PALLAS)
    b = WireBool.witness(PALLAS)
    (a & b).output()
    (a | b).output()
    (~a).output()
    call = Call()
    call.witness_bool(a, True)
    call.witness_bool(b, False)
    fp_trace, _ = call.trace()
    assert fp_trace.outputs == [0, 1, 0]


def test_affine_ops_match_native():
    # Pallas points: coordinate wires live in Fq
    p_v = ec_mul(PALLAS, PALLAS.generator, rng.randrange(1, PALLAS.r))
    q_v = ec_mul(PALLAS, PALLAS.generator, rng.randrange(1, PALLAS.r))
    p = WireAffine.witness(PALLAS)
    q = WireAffine.witness(PALLAS)
    (p + q).output()
    (-p).output()
    call = Call()
    call.witness_affine(p, p_v)
    call.witness_affine(q, q_v)
    _, fq_trace = call.trace()
    expected_add = ec_add(PALLAS, p_v, q_v)
    assert tuple(fq_trace.outputs[:2]) == expected_add
    assert fq_trace.outputs[2:] == [p_v[0], (-p_v[1]) % PALLAS.p]


def test_in_circuit_permutation_matches_native():
    ins = [WireScalar.witness(VESTA) for _ in range(3)]
    sponge = InnerSponge(VESTA)
    sponge.state = list(ins)
    sponge.permute()
    for s in sponge.state:
        s.output()
    call = Call()
    vals = [rng.randrange(FQ_MOD) for _ in range(3)]
    for w, v in zip(ins, vals):
        call.witness(w, v)
    _, fq_trace = call.trace()
    assert fq_trace.outputs == permute(list(vals), FQ_MOD)


def test_in_circuit_transcript_matches_native():
    # OuterSponge for Pallas: absorb a point + a scalar, squeeze a challenge
    pt = ec_mul(PALLAS, PALLAS.generator, rng.randrange(1, PALLAS.r))
    sc = rng.randrange(PALLAS.r)

    wp = WireAffine.witness(PALLAS)
    ws = WireScalar.witness(PALLAS)
    sponge = OuterSponge(Protocols.PCDL, PALLAS)
    sponge.absorb_g([wp])
    sponge.absorb_fr([ws])
    ch = sponge.challenge()
    ch.output()

    call = Call()
    call.witness_affine(wp, pt)
    call.witness(ws, sc)
    fp_trace, fq_trace = call.trace()

    native = Sponge(Protocols.PCDL, PALLAS)
    native.absorb_g([pt])
    native.absorb_fr([sc])
    assert fp_trace.outputs == [native.challenge()]


def test_in_circuit_transcript_matches_native_vesta():
    pt = ec_mul(VESTA, VESTA.generator, rng.randrange(1, VESTA.r))
    sc = rng.randrange(VESTA.r)

    wp = WireAffine.witness(VESTA)
    ws = WireScalar.witness(VESTA)
    sponge = OuterSponge(Protocols.ASDL, VESTA)
    sponge.absorb_g([wp])
    sponge.absorb_fr([ws])
    ch = sponge.challenge()
    ch.output()

    call = Call()
    call.witness_affine(wp, pt)
    call.witness(ws, sc)
    fp_trace, fq_trace = call.trace()

    native = Sponge(Protocols.ASDL, VESTA)
    native.absorb_g([pt])
    native.absorb_fr([sc])
    assert fq_trace.outputs == [native.challenge()]


def test_in_circuit_schnorr_verify():
    cfg = PALLAS
    sk, pk = schnorr.generate_keypair(cfg)
    msg = [rng.randrange(cfg.p) for _ in range(3)]
    sig = schnorr.sign(cfg, sk, msg, k=rng.randrange(1, cfg.r))
    assert schnorr.verify(cfg, pk, msg, sig)

    wire_pk = WireAffine.witness(cfg)
    wire_sig = WireSchnorrSignature.witness(cfg)
    wire_msg = [WireScalar.witness(VESTA) for _ in msg]  # base-field wires
    ok = wire_sig.verify(wire_pk, wire_msg)
    ok.output()

    call = Call()
    call.witness_affine(wire_pk, pk)
    bind_signature(call, wire_sig, sig)
    for w, v in zip(wire_msg, msg):
        call.witness(w, v)
    fp_trace, fq_trace = call.trace()
    assert fq_trace.outputs == [1]


def test_in_circuit_schnorr_rejects_bad_signature():
    cfg = PALLAS
    sk, pk = schnorr.generate_keypair(cfg)
    msg = [5]
    sig = schnorr.sign(cfg, sk, msg, k=rng.randrange(1, cfg.r))
    bad = schnorr.SchnorrSignature(r=sig.r, s=(sig.s + 1) % cfg.r)

    wire_pk = WireAffine.witness(cfg)
    wire_sig = WireSchnorrSignature.witness(cfg)
    wire_msg = [WireScalar.witness(VESTA)]
    ok = wire_sig.verify(wire_pk, wire_msg)
    ok.output()

    call = Call()
    call.witness_affine(wire_pk, pk)
    bind_signature(call, wire_sig, bad)
    call.witness(wire_msg[0], 5)
    _, fq_trace = call.trace()
    assert fq_trace.outputs == [0]
