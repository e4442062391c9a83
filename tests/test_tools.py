"""Tooling round-trips: fixture generator, chunked_commit, timing, errors."""

import random

import pytest

from halo_tpu import acc as acc_mod
from halo_tpu import pcdl
from halo_tpu.curves import PALLAS
from halo_tpu.errors import AccumulationError, PcdlCheckError, VerificationError
from halo_tpu.serde import Reader, Writer

rng = random.Random(8)


def test_fixture_generator_roundtrip():
    from tools.gen_fixtures import gen_entry

    w = Writer()
    entries = [gen_entry(1 << k, rng) for k in (2, 3)]
    w.u64(len(entries))
    for n, q, a in entries:
        w.u64(n)
        q.serialize(w, PALLAS)
        a.serialize(w, PALLAS)

    r = Reader(w.data())
    count = r.u64()
    assert count == 2
    for n_want, q_want, a_want in entries:
        n = r.u64()
        q = pcdl.Instance.deserialize(r, PALLAS)
        a = acc_mod.Accumulator.deserialize(r, PALLAS)
        assert n == n_want and q == q_want and a.q == a_want.q
        acc_mod.decider(PALLAS, a)  # generated accumulators must verify
    assert r.done()


def test_chunked_commit_matches_whole():
    from halo_tpu.curves import ec_add

    n = 16
    p = [rng.randrange(PALLAS.r) for _ in range(n)]
    chunks = pcdl.chunked_commit(PALLAS, p, n - 1, chunk_size=4)
    assert len(chunks) == 4
    # chunk commitments use Gs[0..] per chunk, so they are commitments of the
    # chunk coefficient vectors; verify each against a direct commit
    for i, c in enumerate(chunks):
        assert c == pcdl.commit(PALLAS, p[4 * i : 4 * i + 4], n - 1)


def test_error_taxonomy():
    n = 8
    p = [rng.randrange(PALLAS.r) for _ in range(n)]
    z = rng.randrange(PALLAS.r)
    inst = pcdl.Instance.open(PALLAS, p, n - 1, z, w=None)
    with pytest.raises(PcdlCheckError):
        pcdl.check(PALLAS, inst.C, inst.d, inst.z, (inst.v + 1) % PALLAS.r, inst.pi)
    acc = acc_mod.prover(PALLAS, [inst])
    bad = acc_mod.Accumulator(q=pcdl.Instance(C=acc.q.C, d=acc.q.d, z=(acc.q.z + 1) % PALLAS.r,
                                              v=acc.q.v, pi=acc.q.pi))
    with pytest.raises(AccumulationError):
        acc_mod.verifier(PALLAS, [inst], bad)
    # taxonomy: both are VerificationErrors and (compat) ValueErrors
    assert issubclass(PcdlCheckError, VerificationError)
    assert issubclass(AccumulationError, ValueError)


def test_round_timer(capsys, monkeypatch):
    monkeypatch.setenv("HALO_TPU_TIMING", "1")
    from halo_tpu.utils.timing import RoundTimer

    t = RoundTimer("unit")
    t.mark("phase_a")
    with t.round("phase_b"):
        pass
    line = t.report()
    assert "phase_a" in line and "phase_b" in line and "total" in line
    out = capsys.readouterr().out
    assert "[timing] unit: phase_a" in out
