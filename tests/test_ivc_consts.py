"""Bit-exact cross-implementation anchor: the reference's frozen IVC artifacts.

The reference hard-codes, for its fixed 2^16-row IVC circuit:
  * base-case accumulators acc_0_pallas / acc_0_vesta
    (crates/plonk/src/frontend/ivc/mod.rs:195-292), produced by
    Accumulator::zero(65536, 1), and
  * the circuit commitments IVC_FP_CIRCUIT / IVC_FQ_CIRCUIT
    (ivc/mod.rs:52-165, rows=65536, public inputs 405/725), produced by
    print_ivc_circuit (ivc/mod.rs:467-605).

tools/extract_ivc_consts.py parses those consts into
tests/fixtures/ivc_consts.json (Montgomery -> canonical, Jacobian -> affine).
Reproducing them here transitively pins the ENTIRE stack against the Rust
reference: SRS bytes -> MSM -> Poseidon transcript -> pcdl.open fold ->
acc.prover, and (for the circuit commitments) the whole arithmetizer.
"""

import json
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "ivc_consts.json"
ROWS = 65536


@pytest.fixture(scope="module")
def consts():
    return json.loads(FIXTURE.read_text())


def _pt(p):
    return None if p is None else (int(p[0]), int(p[1]))


def test_fixture_sanity(consts):
    """The extracted consts parse to on-curve points with the right shape."""
    from halo_tpu.fields import FP_MOD, FQ_MOD

    assert consts["fp_circuit"]["public_input_count"] == 405
    assert consts["fq_circuit"]["public_input_count"] == 725
    assert consts["fp_circuit"]["rows"] == ROWS

    def check(pts, mod):
        for p in pts:
            if p is None:
                continue
            x, y = int(p[0]), int(p[1])
            assert y * y % mod == (x * x * x + 5) % mod

    check(consts["fp_circuit"]["qs"], FQ_MOD)
    check(consts["fq_circuit"]["qs"], FP_MOD)
    check(consts["acc_0_pallas"]["Ls"], FQ_MOD)
    check(consts["acc_0_vesta"]["Rs"], FP_MOD)
    # omega must be a primitive 2^16-th root of unity in the circuit's field
    for key, mod in (("fp_circuit", FP_MOD), ("fq_circuit", FQ_MOD)):
        w = int(consts[key]["omega"])
        assert pow(w, ROWS, mod) == 1 and pow(w, ROWS // 2, mod) != 1


@pytest.mark.slow
@pytest.mark.parametrize("which", ["pallas", "vesta"])
def test_zero_accumulator_matches_reference(consts, which):
    """Accumulator::zero(65536, 1) == the frozen acc_0 consts (acc.rs:37-41,
    ivc/mod.rs:195-292).  Pins SRS, MSM, transcript, and the IPA fold."""
    from halo_tpu import acc as acc_mod
    from halo_tpu.curves import PALLAS, VESTA

    cfg = PALLAS if which == "pallas" else VESTA
    ref = consts[f"acc_0_{which}"]
    # from-scratch path explicitly (zero_accumulator itself now short-
    # circuits to this very fixture at the production shape)
    q = acc_mod.prover(cfg, [acc_mod.zero_instance(cfg, ROWS)]).q

    assert q.d == ref["d"]
    assert q.C == _pt(ref["C"])
    assert q.z == int(ref["z"])
    assert q.v == int(ref["v"])
    assert q.pi.c == int(ref["c"])
    assert q.pi.U == _pt(ref["U"])
    assert [q.pi.Ls[i] for i in range(16)] == [_pt(p) for p in ref["Ls"]]
    assert [q.pi.Rs[i] for i in range(16)] == [_pt(p) for p in ref["Rs"]]
    assert q.pi.C_bar is None and q.pi.w_prime is None


def test_ivc_pi_counts():
    """The wire IVC circuit's public-input counts reach the reference's
    fixed point: 405 (Fp) / 725 (Fq) (ivc/mod.rs:54-55,110-112)."""
    from halo_tpu.frontend.ivc import _measure_pi_counts

    assert _measure_pi_counts(ROWS) == (405, 725)


@pytest.mark.slow
def test_freeze_ivc_circuits_matches_reference(consts):
    """freeze_ivc_circuits(65536) reproduces IVC_FP_CIRCUIT / IVC_FQ_CIRCUIT
    commitment-for-commitment (ivc/mod.rs:52-165).  Pins the arithmetizer,
    build_sigma, the row layout, and the preprocessing commitments."""
    from halo_tpu.frontend.ivc import freeze_ivc_circuits

    # use_cache=False: recompute from scratch — the cached params and the
    # production load path come FROM this fixture, so a cached comparison
    # would be circular
    params = freeze_ivc_circuits(ROWS, use_cache=False)

    for name, circ in (("fp_circuit", params.fp_circuit), ("fq_circuit", params.fq_circuit)):
        ref = consts[name]
        assert circ.rows == ref["rows"], name
        assert circ.public_input_count == ref["public_input_count"], name
        assert circ.omega == int(ref["omega"]), name
        for key, got in (("qs", circ.Cs.qs), ("rs", circ.Cs.rs),
                         ("ids", circ.Cs.ids), ("sigmas", circ.Cs.sigmas)):
            want = [_pt(p) for p in ref[key]]
            assert len(got) == len(want), f"{name}.{key}"
            for i, (g, w) in enumerate(zip(got, want)):
                assert g == w, f"{name}.{key}[{i}]"
