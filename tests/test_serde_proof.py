"""Golden proof fixtures: the canonical proof byte encoding is stable.

One committed fixture per curve (tests/fixtures/proof_{pallas,vesta}.bin).
The prover is deterministic without hiding, so re-proving the fixed circuit
must reproduce the committed bytes exactly; any change to the transcript,
MSM, fold, or codec shows up as a byte diff here.

Regenerate (after an INTENTIONAL protocol change) with:
    python -m tests.test_serde_proof
"""

from pathlib import Path

import pytest

from halo_tpu.curves import PALLAS, VESTA
from halo_tpu.plonk import protocol
from halo_tpu.plonk.circuit import FP, FQ, CircuitSpec, TraceBuilder
from halo_tpu.plonk.trace import trace_pair

FIXDIR = Path(__file__).parent / "fixtures"


def _mk_proof(which: str):
    """Deterministic 2-field circuit: both curves' proofs from one spec."""
    spec = CircuitSpec()
    vals = {}
    for fid in (FP, FQ):
        x = spec.witness(fid)
        y = spec.witness(fid)
        out = spec.mul_gate(spec.add_gate(x, y), x)
        spec.output_gate(out)
        vals[fid] = (x, y)
    tb = TraceBuilder(spec)
    tb.witness(vals[FP][0], 3)
    tb.witness(vals[FP][1], 41)
    tb.witness(vals[FQ][0], 7)
    tb.witness(vals[FQ][1], 11)
    fp_trace, fq_trace = trace_pair(tb)
    trace = fp_trace if which == "pallas" else fq_trace
    cfg = PALLAS if which == "pallas" else VESTA
    circuit, pub, w = trace.consume()
    proof = protocol.naive_prover(cfg, circuit, pub, w)
    protocol.verify(cfg, proof, circuit, pub)
    return cfg, proof


@pytest.mark.parametrize("which", ["pallas", "vesta"])
def test_golden_proof_bytes(which):
    cfg, proof = _mk_proof(which)
    data = proof.to_bytes(cfg)
    golden = (FIXDIR / f"proof_{which}.bin").read_bytes()
    assert data == golden, f"{which} proof bytes diverged from golden fixture"
    back = protocol.PlonkProof.from_bytes(data, cfg)
    assert back.to_bytes(cfg) == data


if __name__ == "__main__":  # regenerate fixtures
    FIXDIR.mkdir(exist_ok=True)
    for which in ("pallas", "vesta"):
        cfg, proof = _mk_proof(which)
        path = FIXDIR / f"proof_{which}.bin"
        path.write_bytes(proof.to_bytes(cfg))
        print(f"wrote {path} ({path.stat().st_size} bytes)")
