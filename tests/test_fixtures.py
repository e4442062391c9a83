"""Byte-exact parsing of the reference's serialized instances/accumulators.

qs.bin holds (n, Instance, Accumulator) for n = 2^2..2^20
(crates/accumulation/src/main.rs).  NOTE: the shipped file predates the
reference's removal of accumulation hiding — its Accumulator still carries
pi_V = (h_0, U_0, w) and its instances use a transcript era that no longer
matches HEAD (HEAD's own criterion benches cannot deserialize it either, as
the struct layouts changed).  We therefore use it to pin the ark-serialize
codec (parse + byte-identical re-serialization + on-curve/canonicality),
not the transcript.  The HEAD-era transcript anchor is the frozen IVC
base-case accumulator consts (plonk/src/frontend/ivc/mod.rs:195-292),
reproduced in tests/test_ivc_consts.py once the device MSM tier is up.
"""

from pathlib import Path

import pytest

from halo_tpu import acc as acc_mod
from halo_tpu import pcdl
from halo_tpu.curves import PALLAS
from halo_tpu.serde import Reader, Writer

QS = Path("/root/reference/crates/accumulation/.precompute/qs.bin")


@pytest.fixture(scope="module")
def fixtures():
    # qs.bin predates the reference's hiding removal (acc.rs:141-174 comments):
    # its Accumulator is { q: Instance, pi_V: (h_0: Vec<F>, U_0: Point, w: F) }.
    r = Reader(QS.read_bytes())
    out = []
    for _ in range(r.u64()):
        n = r.u64()
        q = pcdl.Instance.deserialize(r, PALLAS)
        a = acc_mod.Accumulator.deserialize(r, PALLAS)
        h0 = r.vec(lambda: r.field(PALLAS.r))
        u0 = r.point_compressed(PALLAS)
        w = r.field(PALLAS.r)
        out.append((n, q, a, (h0, u0, w)))
    assert r.done()
    return out


def test_parse_all(fixtures):
    assert len(fixtures) == 19
    for n, q, a, piv in fixtures:
        assert q.d == n - 1
        assert a.q.d == n - 1
        assert len(q.pi.Ls) == n.bit_length() - 1
        assert PALLAS.is_on_curve(q.C)
        assert q.pi.C_bar is not None  # generated with hiding
        assert len(piv[0]) == 2  # h_0 is linear


def test_all_points_on_curve(fixtures):
    for n, q, a, (h0, u0, w) in fixtures[:6]:
        for pt in [q.C, q.pi.U, q.pi.C_bar, u0, a.q.C, a.q.pi.U] + q.pi.Ls + q.pi.Rs:
            assert PALLAS.is_on_curve(pt)


def test_serde_roundtrip(fixtures):
    raw = QS.read_bytes()
    w = Writer()
    w.u64(len(fixtures))
    for n, q, a, (h0, u0, wv) in fixtures:
        w.u64(n)
        q.serialize(w, PALLAS)
        a.serialize(w, PALLAS)
        w.vec(h0, lambda c: w.field(c))
        w.point_compressed(PALLAS, u0)
        w.field(wv)
    assert w.data() == raw
