"""PLONK end-to-end tests (mirror reference trace.rs / protocol.rs tests)."""

import random

import pytest

from halo_tpu.plonk import circuit as circ
from halo_tpu.plonk import protocol, trace as trace_mod
from halo_tpu.plonk.circuit import FP, FQ, CircuitSpec, TraceBuilder
from halo_tpu.plonk.trace import trace_pair

rng = random.Random(3)


def prove_and_verify_both(fp_trace, fq_trace):
    for t in (fp_trace, fq_trace):
        circuit, x, w = t.consume()
        proof = protocol.naive_prover(t.cfg, circuit, x, w)
        protocol.verify(t.cfg, proof, circuit, x)


def test_circuit_eval1():
    # (from reference test_circuit_eval1): 11 + 7 * ((2+3)*5) = 186
    spec = CircuitSpec()
    x7 = spec.fp_public_input()
    x2 = spec.fp_witness()
    x3 = spec.fp_witness()
    x5 = spec.fp_witness()
    c11 = spec.constant(FP, 11)
    a5 = spec.add_gate(x2, x3)
    mul25 = spec.mul_gate(a5, x5)
    mul175 = spec.mul_gate(x7, mul25)
    add186 = spec.add_gate(c11, mul175)
    spec.output_gate(add186)

    tb = TraceBuilder(spec)
    tb.witness(x2, 2)
    tb.witness(x3, 3)
    tb.witness(x5, 5)
    tb.public_input(x7, 7)
    fp_trace, fq_trace = trace_pair(tb)

    fp_trace.test_copy_constraints()
    assert fp_trace.outputs == [186]
    prove_and_verify_both(fp_trace, fq_trace)


def test_circuit_eval_assert_eq():
    spec = CircuitSpec()
    x = spec.fp_witness()
    y = spec.fp_witness()
    spec.assert_eq_gate(x, y)

    tb = TraceBuilder(spec)
    tb.witness(x, 3)
    tb.witness(y, 3)
    fp_trace, fq_trace = trace_pair(tb)
    fp_trace.test_copy_constraints()
    prove_and_verify_both(fp_trace, fq_trace)


def test_unsatisfied_circuit_rejected():
    # x*x == y with inconsistent witness -> fp proof must fail
    spec = CircuitSpec()
    x = spec.fp_witness()
    xx = spec.mul_gate(x, x)
    y = spec.fp_witness()
    spec.assert_eq_gate(xx, y)

    tb = TraceBuilder(spec)
    tb.witness(x, 3)
    tb.witness(y, 5)
    fp_trace, fq_trace = trace_pair(tb)

    circuit, x_pi, w = fp_trace.consume()
    proof = protocol.naive_prover(fp_trace.cfg, circuit, x_pi, w)
    with pytest.raises(ValueError):
        protocol.verify(fp_trace.cfg, proof, circuit, x_pi)
    # the untouched fq side still proves
    circuit, x_pi, w = fq_trace.consume()
    proof = protocol.naive_prover(fq_trace.cfg, circuit, x_pi, w)
    protocol.verify(fq_trace.cfg, proof, circuit, x_pi)


def test_poseidon_gates():
    # two Poseidon rounds-gates + end (mirrors reference test_poseidon, smaller)
    spec = CircuitSpec()
    x1 = spec.fp_witness()
    x2 = spec.fp_witness()
    x3 = spec.fp_witness()
    p0, p1, p2 = spec.poseidon(0, (x1, x2, x3))
    p3, p4, p5 = spec.poseidon(1, (p0, p1, p2))
    p6, p7, p8 = spec.poseidon_finish((p3, p4, p5))
    m1 = spec.mul_gate(p6, p7)
    m2 = spec.mul_gate(m1, p8)
    spec.output_gate(m2)

    tb = TraceBuilder(spec)
    tb.witness(x1, rng.randrange(1, 10))
    tb.witness(x2, rng.randrange(1, 10))
    tb.witness(x3, rng.randrange(1, 10))
    fp_trace, fq_trace = trace_pair(tb)
    fp_trace.test_copy_constraints()
    prove_and_verify_both(fp_trace, fq_trace)


def test_poseidon_gate_matches_host_permutation():
    # 11 Poseidon gates (5 rounds each) + end = the full 55-round permutation
    from halo_tpu.fields import FP_MOD
    from halo_tpu.poseidon.sponge import permute

    spec = CircuitSpec()
    ins = [spec.fp_witness() for _ in range(3)]
    state = tuple(ins)
    for r in range(11):
        state = spec.poseidon(r, state)
    state = spec.poseidon_finish(state)
    for w in state:
        spec.output_gate(w)

    tb = TraceBuilder(spec)
    vals = [rng.randrange(FP_MOD) for _ in range(3)]
    for w, v in zip(ins, vals):
        tb.witness(w, v)
    fp_data, _ = tb.trace()
    assert fp_data.outputs == permute(list(vals), FP_MOD)


def test_affine_add_gate():
    # in-circuit point add matches host EC (on Pallas: coords in Fq)
    from halo_tpu import curves as hc

    cfg = hc.PALLAS  # coordinates in Fq -> fid FQ
    p = hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r))
    q = hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r))
    expected = hc.ec_add(cfg, p, q)

    spec = CircuitSpec()
    xp = spec.witness(FQ)
    yp = spec.witness(FQ)
    xq = spec.witness(FQ)
    yq = spec.witness(FQ)
    xr, yr = spec.add_points((xp, yp), (xq, yq))
    spec.output_gate(xr)
    spec.output_gate(yr)

    tb = TraceBuilder(spec)
    tb.witness(xp, p[0])
    tb.witness(yp, p[1])
    tb.witness(xq, q[0])
    tb.witness(yq, q[1])
    fp_trace, fq_trace = trace_pair(tb)
    assert tuple(fq_trace.outputs) == expected
    prove_and_verify_both(fp_trace, fq_trace)


def test_eq_and_bool_gates():
    spec = CircuitSpec()
    a = spec.fp_witness()
    b = spec.fp_witness()
    e1 = spec.eq_gate(a, b)
    c = spec.fp_witness()
    e2 = spec.eq_gate(a, c)
    bit = spec.witness_bool(FP)
    spec.output_gate(e1)
    spec.output_gate(e2)
    spec.output_gate(bit)

    tb = TraceBuilder(spec)
    tb.witness(a, 5)
    tb.witness(b, 5)
    tb.witness(c, 6)
    tb.witness(bit, 1)
    fp_trace, fq_trace = trace_pair(tb)
    assert fp_trace.outputs == [1, 0, 1]
    prove_and_verify_both(fp_trace, fq_trace)


def test_inv_neg_gates():
    from halo_tpu.fields import FP_MOD

    spec = CircuitSpec()
    x = spec.fp_witness()
    xi = spec.inv_gate(x)
    xn = spec.neg_gate(x)
    spec.output_gate(xi)
    spec.output_gate(xn)

    tb = TraceBuilder(spec)
    tb.witness(x, 7)
    fp_trace, fq_trace = trace_pair(tb)
    assert fp_trace.outputs == [pow(7, -1, FP_MOD), (FP_MOD - 7) % FP_MOD]
    prove_and_verify_both(fp_trace, fq_trace)


@pytest.mark.slow
def test_scalar_mul_vesta_gate():
    # scalar-mul gate inside the Fq trace: scalar (Fq value embedded), point on Pallas
    from halo_tpu import curves as hc

    cfg = hc.PALLAS
    k = rng.randrange(1, 1 << 200)
    g = cfg.generator
    expected = hc.ec_mul(cfg, g, k)

    spec = CircuitSpec()
    s = spec.witness(FQ)
    xg = spec.witness(FQ)
    yg = spec.witness(FQ)
    xr, yr = spec.scalar_mul_vesta(s, (xg, yg))
    spec.output_gate(xr)
    spec.output_gate(yr)

    tb = TraceBuilder(spec)
    tb.witness(s, k)
    tb.witness(xg, g[0])
    tb.witness(yg, g[1])
    fp_data, fq_data = tb.trace()
    assert tuple(fq_data.outputs) == expected


def test_message_pass_values():
    # fq value crosses into the fp trace; fp value splits into (high, low)
    from halo_tpu.fields import FQ_MOD

    spec = CircuitSpec()
    v = spec.fq_witness()
    crossed = spec.fq_message_pass(v)
    spec.output_gate(crossed)

    w = spec.fp_witness()
    high, low = spec.fp_message_pass(w)
    spec.output_gate(high)
    spec.output_gate(low)

    tb = TraceBuilder(spec)
    val = rng.randrange(FQ_MOD)
    tb.witness(v, val)
    wval = rng.randrange(FQ_MOD)
    tb.witness(w, wval)
    fp_data, fq_data = tb.trace()
    assert fp_data.outputs == [val]
    assert fq_data.outputs == [wval >> 1, wval & 1]
    # message-pass values appear as public inputs of the receiving trace
    assert fp_data.public_inputs[-1] == val
    assert fq_data.public_inputs[-2:] == [wval >> 1, wval & 1]


def test_scalar_mul_batch_matches_reference():
    """The batched (Jacobian chain + batch_inv0) scalar-mul witness rows are
    bit-identical to the sequential sp_add/affine_*_params path they
    replaced, including identity-prefix rows and the zero scalar."""
    from halo_tpu.plonk.circuit import (
        TraceBuilder,
        affine_add_params,
        affine_double_params,
        sp_add,
    )
    from halo_tpu.curves import PALLAS, VESTA, ec_mul
    from halo_tpu.fields import FP_MOD, FQ_MOD

    rng2 = random.Random(123)
    tb = TraceBuilder.__new__(TraceBuilder)  # method under test is pure
    for cfg, m in ((VESTA, FP_MOD), (PALLAS, FQ_MOD)):
        gpt = ec_mul(cfg, cfg.generator, rng2.randrange(1, cfg.r))
        for h in (0, 1, 2, 5, rng2.randrange(1 << 254), (1 << 254) - 1):
            bits = [(h >> i) & 1 for i in range(253, -1, -1)]
            got = tb._scalar_mul_rows_batch(m, cfg, gpt, bits)
            point_acc = (0, 0)
            for bit, row in zip(bits, got):
                q_pt = sp_add(cfg, point_acc, point_acc)
                r_pt = sp_add(cfg, q_pt, gpt)
                beta_q, lam_q = affine_double_params(m, point_acc)
                al, _, ga, de, la = affine_add_params(m, q_pt, gpt)
                assert row == (q_pt, r_pt, beta_q, lam_q, al, ga, de, la)
                point_acc = r_pt if bit else q_pt
    # identity generator (the (0,0) special-point convention)
    bits = [1, 0, 1, 1]
    got = tb._scalar_mul_rows_batch(FP_MOD, VESTA, (0, 0), bits)
    point_acc = (0, 0)
    for bit, row in zip(bits, got):
        q_pt = sp_add(VESTA, point_acc, point_acc)
        r_pt = sp_add(VESTA, q_pt, (0, 0))
        beta_q, lam_q = affine_double_params(FP_MOD, point_acc)
        al, _, ga, de, la = affine_add_params(FP_MOD, q_pt, (0, 0))
        assert row == (q_pt, r_pt, beta_q, lam_q, al, ga, de, la)
        point_acc = r_pt if bit else q_pt
