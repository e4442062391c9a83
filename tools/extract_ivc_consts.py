"""Extract the reference's frozen IVC artifacts into a JSON fixture.

The reference hard-codes its 2^16-row IVC circuit commitments
(IVC_FP_CIRCUIT / IVC_FQ_CIRCUIT, crates/plonk/src/frontend/ivc/mod.rs:52-165)
and base-case accumulators (acc_0_pallas / acc_0_vesta, ivc/mod.rs:195-292)
as Rust consts: points as Jacobian (X, Y, Z) with each coordinate a 4x64-bit
Montgomery-form BigInt (Fp::new_unchecked), scalars likewise.

This tool parses those literals out of the Rust source, converts Montgomery
-> canonical integers, normalizes Jacobian -> affine (x = X/Z^2, y = Y/Z^3;
Z = 0 -> infinity = null), and writes tests/fixtures/ivc_consts.json.  The
fixture is the bit-exact cross-implementation anchor for the whole stack
(SRS -> MSM -> transcript -> pcdl.open -> acc.prover -> arithmetizer).

Usage: python tools/extract_ivc_consts.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from halo_tpu.fields import FP_MOD, FQ_MOD, from_mont, inv

REF = Path("/root/reference/crates/plonk/src/frontend/ivc/mod.rs")
OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "ivc_consts.json"

_POINT_RE = re.compile(
    r"const_(pallas|vesta)\(\s*\[([^\]]*)\]\s*,\s*\[([^\]]*)\]\s*,\s*\[([^\]]*)\]\s*\)"
)
_SCALAR_RE = re.compile(r"const_(fp|fq)\(\[([^\]]*)\]\)")


def _limbs(text: str) -> int:
    v = 0
    for i, part in enumerate(text.split(",")):
        v |= int(part.strip()) << (64 * i)
    return v


def _point(m: re.Match) -> list[str] | None:
    # const_pallas coords are in Fq (Pallas base field); const_vesta in Fp.
    mod = FQ_MOD if m.group(1) == "pallas" else FP_MOD
    X = from_mont(_limbs(m.group(2)), mod)
    Y = from_mont(_limbs(m.group(3)), mod)
    Z = from_mont(_limbs(m.group(4)), mod)
    if Z == 0:
        return None
    zi = inv(Z, mod)
    return [str(X * zi * zi % mod), str(Y * zi * zi * zi % mod)]


def _scalar(m: re.Match) -> str:
    mod = FP_MOD if m.group(1) == "fp" else FQ_MOD
    return str(from_mont(_limbs(m.group(2)), mod))


def _points_in(text: str) -> list:
    return [_point(m) for m in _POINT_RE.finditer(text)]


def _scalars_in(text: str) -> list[str]:
    return [_scalar(m) for m in _SCALAR_RE.finditer(text)]


def _section(src: str, start: str, end: str) -> str:
    i = src.index(start)
    return src[i : src.index(end, i)]


def _parse_circuit(text: str, rows: int, pi: int) -> dict:
    omega = _scalars_in(_section(text, "omega:", "Cs:"))[0]
    qs = _points_in(_section(text, "qs: [", "rs: ["))
    rs = _points_in(_section(text, "rs: [", "ids: ["))
    ids = _points_in(_section(text, "ids: [", "sigmas: ["))
    sigmas = _points_in(_section(text, "sigmas: [", "}\n};"))
    assert (len(qs), len(rs), len(ids), len(sigmas)) == (10, 15, 8, 8), (
        len(qs), len(rs), len(ids), len(sigmas))
    return {
        "rows": rows,
        "public_input_count": pi,
        "omega": omega,
        "qs": qs,
        "rs": rs,
        "ids": ids,
        "sigmas": sigmas,
    }


def _parse_acc(text: str, rows: int) -> dict:
    # Instance { C, d, z, v, pi: EvalProof { c, U, Ls, Rs } } in source order.
    head = _section(text, "C:", "Ls: ")
    C = _points_in(head)[0]
    z, v, c = _scalars_in(head)  # z, v, then pi.c
    ls = _points_in(_section(text, "Ls: ", "Rs: "))
    u = _points_in(head)[1]
    rs = _points_in(_section(text, "Rs: ", "C_bar:"))
    assert len(ls) == 16 and len(rs) == 16, (len(ls), len(rs))
    return {"C": C, "d": rows - 1, "z": z, "v": v, "c": c, "U": u, "Ls": ls, "Rs": rs}


def main() -> None:
    src = REF.read_text()

    fp_rows = int(re.search(r"IVC_FP_CIRCUIT[^=]*= PlonkCircuit \{\s*rows: (\d+)", src).group(1))
    fp_pi = int(_section(src, "pub const IVC_FP_CIRCUIT", "omega").split("public_input_count:")[1].split(",")[0])
    fq_pi = int(_section(src, "pub const IVC_FQ_CIRCUIT", "fn deep_assert").split("public_input_count:")[1].split(",")[0])

    fp_circ = _parse_circuit(_section(src, "pub const IVC_FP_CIRCUIT", "pub const IVC_FQ_CIRCUIT"), fp_rows, fp_pi)
    fq_circ = _parse_circuit(_section(src, "pub const IVC_FQ_CIRCUIT", "fn deep_assert_circuit"), fp_rows, fq_pi)
    acc_p = _parse_acc(_section(src, "let acc_0_pallas", "let acc_0_vesta"), fp_rows)
    acc_v = _parse_acc(_section(src, "let acc_0_vesta", "let rows = IVC_FP_CIRCUIT.rows"), fp_rows)

    # sanity: on-curve check for every non-infinity point (y^2 = x^3 + 5)
    def check(pts, mod):
        for pt in pts:
            if pt is None:
                continue
            x, y = int(pt[0]), int(pt[1])
            assert y * y % mod == (x * x * x + 5) % mod, "off-curve point in consts"

    for circ, mod in ((fp_circ, FQ_MOD), (fq_circ, FP_MOD)):
        for key in ("qs", "rs", "ids", "sigmas"):
            check(circ[key], mod)
    check([acc_p["C"], acc_p["U"], *acc_p["Ls"], *acc_p["Rs"]], FQ_MOD)
    check([acc_v["C"], acc_v["U"], *acc_v["Ls"], *acc_v["Rs"]], FP_MOD)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({
        "source": "crates/plonk/src/frontend/ivc/mod.rs:52-292",
        "fp_circuit": fp_circ,
        "fq_circuit": fq_circ,
        "acc_0_pallas": acc_p,
        "acc_0_vesta": acc_v,
    }, indent=1))
    print(f"wrote {OUT} (fp pi={fp_pi}, fq pi={fq_pi}, rows={fp_rows})")


if __name__ == "__main__":
    main()
