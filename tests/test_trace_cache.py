"""Batched interpolation + static-trace-cache correctness (round-4 IVC
arithmetizer optimization: profiled 108 s of 120 s per step was per-poly
device INTT round-trips, 82 of 116 of them static per circuit)."""

import random

import pytest

from halo_tpu import hostpoly
from halo_tpu.fields import FP_MOD
from halo_tpu.plonk import trace as trace_mod
from halo_tpu.plonk.circuit import FP, FQ, CircuitSpec, TraceBuilder
from halo_tpu.plonk.trace import Trace, trace_pair

rng = random.Random(99)


def test_ntt_host_batch_matches_single_small():
    n = 256  # below NTT_DEVICE_MIN: list fallback path
    vecs = [[rng.randrange(FP_MOD) for _ in range(n)] for _ in range(3)]
    got = hostpoly.ntt_host_batch(FP_MOD, vecs)
    want = [hostpoly.ntt_host(FP_MOD, v) for v in vecs]
    assert got == want


def test_ntt_host_batch_matches_single_device():
    n = max(hostpoly.NTT_DEVICE_MIN, 8192)  # device-batched path
    vecs = [[rng.randrange(FP_MOD) for _ in range(n)] for _ in range(3)]
    got, dev_out, dev_in = hostpoly.ntt_host_batch(
        FP_MOD, vecs, inverse=True, want_dev=True)
    want = [hostpoly.ntt_host(FP_MOD, v, inverse=True) for v in vecs]
    assert got == want
    assert dev_out is not None and dev_out.shape == (3, n, 16)
    assert dev_in is not None and dev_in.shape == (3, n, 16)
    # the kept device mirrors must be exactly what a fresh upload produces
    import numpy as np

    from halo_tpu.ops import ff

    ctx = ff.ctx_for(FP_MOD)
    fresh = ff.to_mont_jit(ctx, __import__("jax.numpy", fromlist=["asarray"]).asarray(
        ff.ints_to_array(got[1])))
    assert np.array_equal(np.asarray(dev_out[1]), np.asarray(fresh))


def _tiny_traced(pi_val: int, w_val: int):
    spec = CircuitSpec()
    a = spec.public_input(FP)
    b = spec.witness(FP)
    c = spec.mul_gate(a, b)
    d = spec.add_gate(c, b)
    spec.output_gate(d)
    tb = TraceBuilder(spec)
    tb.public_input(a, pi_val)
    tb.witness(b, w_val)
    return trace_pair(tb)


def test_static_trace_cache_reuse_and_correctness():
    # first pass, no frozen circuit: defines the ground truth
    fp1, _ = _tiny_traced(3, 7)
    circuit, _, w1 = fp1.consume()

    trace_mod._STATIC_TRACE_CACHE.clear()
    # two passes with the SAME frozen circuit but different witnesses:
    # the second must hit the cache and still produce correct statics
    fp2, _ = _tiny_traced(3, 7)
    fp2 = Trace.new(fp2.cfg, _retrace(3, 7), circuit=circuit)
    assert len(trace_mod._STATIC_TRACE_CACHE) == 1
    fp3 = Trace.new(fp3_cfg := fp2.cfg, _retrace(5, 11), circuit=circuit)
    assert len(trace_mod._STATIC_TRACE_CACHE) == 1  # hit, not a second entry

    _, _, w2 = fp2.consume()
    _, _, w3 = fp3.consume()
    # statics identical to the uncached ground truth
    assert w2.polys.qs == w1.polys.qs
    assert w2.polys.rs == w1.polys.rs
    assert w2.polys.ids == w1.polys.ids
    assert w2.polys.sigmas == w1.polys.sigmas
    assert w3.polys.qs == w1.polys.qs
    assert w3.polys.sigmas == w1.polys.sigmas
    # dynamics differ (different witness)
    assert w3.polys.ws != w2.polys.ws
    # cached statics are the same objects (no recompute)
    assert w3.polys.qs is w2.polys.qs


def _retrace(pi_val: int, w_val: int):
    spec = CircuitSpec()
    a = spec.public_input(FP)
    b = spec.witness(FP)
    c = spec.mul_gate(a, b)
    d = spec.add_gate(c, b)
    spec.output_gate(d)
    tb = TraceBuilder(spec)
    tb.public_input(a, pi_val)
    tb.witness(b, w_val)
    fp_data, _ = tb.trace()
    return fp_data


def test_cached_prover_proof_identical():
    """End-to-end: proofs from a cache-hit trace are byte-identical to the
    cold-trace proofs (the IVC path proves the same frozen circuit every
    step)."""
    from halo_tpu.curves import PALLAS
    from halo_tpu.plonk import protocol

    trace_mod._STATIC_TRACE_CACHE.clear()
    fp_cold, _ = _tiny_traced(3, 7)
    circuit0, _, _ = fp_cold.consume()

    t1 = Trace.new(PALLAS, _retrace(3, 7), circuit=circuit0)
    c1, x1, w1 = t1.consume()
    t2 = Trace.new(PALLAS, _retrace(3, 7), circuit=circuit0)
    c2, x2, w2 = t2.consume()

    p1 = protocol.naive_prover(PALLAS, c1, x1, w1)
    p2 = protocol.naive_prover(PALLAS, c2, x2, w2)
    assert p1.vs == p2.vs and p1.Cs == p2.Cs
    protocol.verify(PALLAS, p2, c2, x2)


def test_device_prover_dev_polys_identical():
    """The device prover consuming pre-resident dev_polys mirrors emits a
    byte-identical proof to the upload path (protocol_device.py _dev)."""
    from halo_tpu.curves import PALLAS
    from halo_tpu.plonk import protocol
    from halo_tpu.plonk.engine import engine_for
    from halo_tpu.plonk.trace import PlonkWitness

    fp, _ = _tiny_traced(3, 7)
    circuit, x, w = fp.consume()
    assert w.dev_polys is None  # tiny trace: below the device-NTT threshold

    base = protocol.naive_prover(PALLAS, circuit, x, w, device=True)

    eng = engine_for(PALLAS)
    w2 = PlonkWitness(
        omega=w.omega,
        polys=w.polys,
        w_evals=w.w_evals,
        dev_polys={
            "qs": eng.to_dev_batch(w.polys.qs),
            "rs": eng.to_dev_batch(w.polys.rs),
            "ids": eng.to_dev_batch(w.polys.ids),
            "sigmas": eng.to_dev_batch(w.polys.sigmas),
            "ws": eng.to_dev_batch(w.polys.ws),
            "w_evals": eng.to_dev_batch([e.vec for e in w.w_evals]),
        },
    )
    dev = protocol.naive_prover(PALLAS, circuit, x, w2, device=True)
    assert base.to_bytes(PALLAS) == dev.to_bytes(PALLAS)
